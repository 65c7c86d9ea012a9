"""Plan-quality pins for the second round-3 operator batch (streaming ts-unit
fix, profiling, skew, LPA, winnowing, incremental rollup, retention, rules,
overlap matrix, phash)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_streaming_schema_matches_parquet_ts_unit():
    """The streaming source schema must track the parquet footer's ts unit:
    the driver testdata is TIMESTAMP(MICROS) today (reads as timestamp);
    a nanos file must come back as long for ns->us conversion."""
    from pyspark.sql import types as T

    from mongraph_spark.streaming.events import _events_schema

    sch = _events_schema(SF)
    assert isinstance(sch["ts"].dataType, T.TimestampType), sch
    # unknown path (no footer to probe) falls back to timestamp, never long
    sch = _events_schema("/nonexistent")
    assert isinstance(sch["ts"].dataType, T.TimestampType), sch


def test_profile_orders_is_one_scan_expand_agg(spark):
    """Multi-count-distinct profiling must compile to ONE scan + Expand +
    two-phase aggregate — not one job per column."""
    from mongraph_spark.queries.relational import profile_orders

    p = _executed_plan(profile_orders(spark, SF))
    assert p.count("Scan parquet") == 1, p
    assert "Expand" in p, p


def test_skew_profile_has_no_global_sort(spark):
    """log2 weight-class bucketing is map-only on the per-key counts: no
    Sort/Window (the ntile alternative would single-reduce every key)."""
    from mongraph_spark.queries.relational import skew_profile

    p = _executed_plan(skew_profile(spark, SF))
    assert "Window" not in p, p
    assert "ntile" not in p.lower(), p


def test_winnowing_explodes_only_minima(spark):
    """The only Generate (explode) in the winnowing plan takes the
    per-doc fps array (winnowed minima), never the shingle stream."""
    from mongraph_spark.queries.text import text_winnowing

    p = _executed_plan(text_winnowing(spark, SF))
    assert p.count("Generate") == 1, p
    assert "explode(fps" in p, p


def test_incremental_rollup_prunes_columns(spark):
    """Both partial-agg branches must read only (ts, event_type, value)."""
    from mongraph_spark.queries.events import events_incremental_rollup

    p = _executed_plan(events_incremental_rollup(spark, SF))
    for chunk in p.split("ReadSchema:")[1:]:
        first = chunk.split("\n")[0]
        assert "props" not in first and "event_id" not in first, first


def test_association_rules_broadcasts_part_counts(spark):
    """Per-part counts and the 1-row basket total must broadcast onto the
    pair table (no sort-merge joins in the rule assembly)."""
    from mongraph_spark.queries.graph_analytics import graph_association_rules

    p = _executed_plan(graph_association_rules(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_phash_fingerprints_once(spark):
    """The fingerprint table is checkpointed before the self-join, so the
    mapInPandas (ArrowEvalPython / FlatMapsInPandas) stage appears zero
    times in the executed pair-join plan (it already ran)."""
    from mongraph_spark.queries.multimodal import mm_phash_neardup

    df = mm_phash_neardup(spark, SF)
    p = _executed_plan(df)
    assert "InPandas" not in p, p


def test_retention_is_two_user_shuffles(spark):
    """Cohort assignment + activity join both key on user_id; the final
    rollup is the only other exchange."""
    from mongraph_spark.queries.events import events_retention_cohorts

    p = _executed_plan(events_retention_cohorts(spark, SF))
    assert p.count("Scan parquet") <= 2, p


def test_lpa_final_state_matches_oracle_shape(spark):
    """LPA output: community sizes >= 2, members sum to <= node count, and
    every community label is a real node id (sanity pin alongside the SQL
    oracle)."""
    from pyspark.sql import functions as F

    from mongraph_spark.queries.graph_analytics import (
        graph_copurchase_pairs,
        graph_label_propagation,
    )

    out = graph_label_propagation(spark, SF)
    rows = out.collect()
    assert all(r.n_members >= 2 for r in rows)
    pairs = graph_copurchase_pairs(spark, SF)
    nodes = set(
        r.n
        for r in pairs.select(F.col("part_a").alias("n"))
        .unionByName(pairs.select(F.col("part_b").alias("n")))
        .distinct()
        .collect()
    )
    assert all(r.community in nodes for r in rows)
    assert sum(r.n_members for r in rows) <= len(nodes)


def test_winnowing_md5_runs_once_per_gram(spark):
    """The md5 gram transform must sit BEHIND the eager localCheckpoint
    barrier — zero md5 in the returned plan (the window pass reads
    materialized gram arrays).  If CollapseProject ever re-inlines the
    transform into the window lambda (the r4 O(n²) scale bug), md5
    reappears here and this pin fails before the bench does (VERDICT r4 #4)."""
    from mongraph_spark.queries.text import text_winnowing

    p = _executed_plan(text_winnowing(spark, SF))
    assert "md5" not in p.lower(), p
    # and the window pass itself is still present, reading the checkpoint
    assert "array_min" in p, p
    assert "Scan ExistingRDD" in p or "LocalTableScan" in p, p
