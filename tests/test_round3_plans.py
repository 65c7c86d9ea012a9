"""Plan-quality pins for the round-3 operators: the physical plans that make
these scale are asserted, not assumed (same style as test_storage_and_plans).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pivot_is_one_aggregation_shuffle(spark):
    """groupBy().pivot(explicit values) must compile to a plain partial-agg
    -> exchange -> final-agg, with no extra distinct scan for the pivot
    column (the explicit value list is what removes it)."""
    from mongraph_spark.queries.events import events_pivot_daily

    p = _executed_plan(events_pivot_daily(spark, SF))
    assert p.count("Exchange") <= 2, p
    assert p.count("Scan parquet") == 1, p


def test_unpivot_prunes_to_measure_columns(spark):
    """stack() is a projection: the lineitem scan must read exactly the four
    measure columns, and the 4-key aggregation is one shuffle."""
    from mongraph_spark.queries.relational import (
        UNPIVOT_MEASURES,
        unpivot_lineitem_measures,
    )

    p = _executed_plan(unpivot_lineitem_measures(spark, SF))
    first_read = p.split("ReadSchema:")[1].split("\n")[0]
    for c in UNPIVOT_MEASURES:
        assert c in first_read, first_read
    assert "l_orderkey" not in first_read, first_read
    assert p.count("Exchange") <= 2, p


def test_tfidf_joins_broadcast_not_sortmerge(spark):
    """The df/N joins must be broadcast at fixture scale (the term-keyed
    sort-merge fallback is the documented 100 TB shape, not the small one)."""
    from mongraph_spark.queries.search import text_tfidf_topterms

    p = _executed_plan(text_tfidf_topterms(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_training_order_is_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    top-k, no global sort); the rank window runs after the 50-row limit."""
    from mongraph_spark.queries.pipeline import pipeline_training_order

    p = _executed_plan(pipeline_training_order(spark, SF))
    assert "TakeOrderedAndProject" in p, p


def test_rolling_window_is_range_frame_one_shuffle(spark):
    """The 7-day rolling sum must be a RANGE-frame window over ONE
    customer-keyed exchange."""
    from mongraph_spark.queries.relational import window_rolling_7day

    p = _executed_plan(window_rolling_7day(spark, SF))
    assert "RangeFrame" in p, p
    assert p.count("Exchange") <= 2, p


def test_chunk_overlap_is_map_side_until_audit(spark):
    """Chunk counts/volumes are closed-form column expressions: the scan
    reads only (source, text) and the only shuffle is the audit groupBy."""
    from mongraph_spark.queries.pipeline import pipeline_chunk_overlap

    p = _executed_plan(pipeline_chunk_overlap(spark, SF))
    first_read = p.split("ReadSchema:")[1].split("\n")[0]
    assert "text" in first_read and "source" in first_read, first_read
    assert "doc_id" not in first_read, first_read
    assert p.count("Exchange") <= 2, p


def test_passage_dedup_shuffles_on_passage(spark):
    """First-occurrence keep must partition by the passage itself (the
    near-uniform key), not by doc."""
    from mongraph_spark.queries.dedup import dedup_passages

    p = _executed_plan(dedup_passages(spark, SF))
    assert "hashpartitioning(passage" in p, p


def test_funnel_is_two_aggregations(spark):
    """Conditional-min funnel: user-keyed agg + 1-row rollup, no joins."""
    from mongraph_spark.queries.events import events_funnel

    p = _executed_plan(events_funnel(spark, SF))
    assert "Join" not in p, p
    assert p.count("Exchange") <= 3, p
