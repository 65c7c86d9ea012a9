"""Plan pins + behavioral invariants for the round-4 operators: each test
asserts the SCALE-relevant property of the executed plan (no cartesian, the
right join strategy, no global sort, bounded sketch memory) — the property
that must survive a 100× scale-up — plus the key semantic invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from mongraph_spark.sparkutil import get_spark

    return get_spark("round4-plans", cpus=8)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- corpus_common_token_ratio ----------------------------------------------------


def test_common_token_ratio_stays_jvm_side(spark):
    """Unigram scoring is pure built-ins: no Python eval anywhere in the
    plan, and the documents scan prunes to (doc_id, text) only."""
    from mongraph_spark.queries.corpus import common_token_ratio

    plan = _plan(common_token_ratio(spark, SF))
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "lang" not in plan.split("ReadSchema")[-1]


# -- events_threshold_anomaly ------------------------------------------------------


def test_threshold_anomaly_broadcasts_thresholds(spark):
    """The per-type threshold table joins back as a BROADCAST (O(|types|)
    rows) — a sort-merge join here would shuffle the full event stream
    against a 5-row side."""
    from mongraph_spark.queries.events import events_threshold_anomaly

    plan = _plan(events_threshold_anomaly(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- events_heavy_hitters ----------------------------------------------------------


def test_heavy_hitters_exact_and_sketch_bounded(spark):
    """The Frequent-sketch candidate pass runs fully JVM-side
    (``freqItems`` — ZERO Python stages in the plan; VERDICT r4 #7
    replaced the Arrow mapInPandas variant), the recount join is a
    broadcast, and the output equals the exact groupBy answer (the
    two-pass guarantee: candidates ⊇ true heavy hitters)."""
    from mongraph_spark.queries.events import HH_DENOM, events_heavy_hitters

    df = events_heavy_hitters(spark, SF)
    plan = _plan(df)
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan

    from mongraph_spark.sparkutil import read_table

    ev = read_table(spark, SF, "events")
    n_total = ev.count()
    exact = {
        (r.user_id, r.n_events)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") * HH_DENOM >= n_total)
        .collect()
    }
    assert {(r.user_id, r.n_events) for r in df.collect()} == exact


# -- sketch_theta_setops -----------------------------------------------------------


def test_theta_sketch_no_global_sort(spark):
    """The k-minima selections compile to TakeOrderedAndProject (per-
    partition top-k + merge), never a full Sort+Limit of the distinct-hash
    set — the property that keeps KMV cheap at any cardinality."""
    from mongraph_spark.queries.relational import sketch_theta_setops

    df = sketch_theta_setops(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan

    # sanity: estimates bracket reality on this data
    row = df.first()
    assert row.exact_inter <= row.exact_union
    assert row.k_used > 0 and row.union_est > 0


# -- interval_overlap_orders -------------------------------------------------------


def test_interval_overlap_is_equi_keyed(spark):
    """The overlap join must be EQUI-keyed on the customer (hash-join on
    custkey with the range filter on top) — a nested-loop/cartesian here is
    the quadratic trap interval joins fall into."""
    from mongraph_spark.queries.relational import interval_overlap_orders

    plan = _plan(interval_overlap_orders(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- er_blocked_pairs --------------------------------------------------------------


def test_er_pairs_equi_blocked(spark):
    """Candidate generation joins on the blocking key (equi), never
    all-pairs; matches are a subset of checked pairs."""
    from mongraph_spark.queries.relational import er_blocked_pairs

    df = er_blocked_pairs(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    bad = df.filter(F.col("n_matches") > F.col("n_pairs_checked")).count()
    assert bad == 0


# -- graph_ppr_seeded --------------------------------------------------------------


def test_ppr_mass_conservation(spark):
    """Personalized PageRank over the undirected adjacency conserves rank
    mass: every node that receives mass has an out-edge, so total rank
    stays 1.0 (minus only basis-point flooring)."""
    from mongraph_spark.queries.graph_analytics import graph_ppr_seeded

    rows = graph_ppr_seeded(spark, SF).collect()
    total_bp = sum(r.sum_rank_bp for r in rows)
    assert 9990 <= total_bp <= 10000
    # seeds (regions, coll_code 1) retain the strongest per-node rank
    by_coll = {r.coll_code: r for r in rows}
    assert by_coll[1].max_rank_bp == max(r.max_rank_bp for r in rows)


# -- store_snapshot_diff -----------------------------------------------------------


def test_snapshot_diff_partitions_keyspace(spark):
    """The CDC classes partition the union keyspace: n_keys sums to the
    distinct users overall, and the net delta equals the cents that arrived
    after the cutoff (conservation — the incremental consumer's invariant)."""
    from mongraph_spark.queries.events import store_snapshot_diff
    from mongraph_spark.sparkutil import read_table

    rows = {r.change_type: r for r in store_snapshot_diff(spark, SF).collect()}
    ev = read_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_keys for r in rows.values()) == n_users

    cut = ev.agg(
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 15 DAYS")).alias("c")
    ).first()["c"]
    post_cents = (
        ev.filter(F.col("ts") >= F.lit(cut))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .first()[0]
    )
    net = sum(r.net_cents_delta for r in rows.values())
    assert net == post_cents
    assert rows.get("unchanged") is None or rows["unchanged"].net_cents_delta == 0


# -- dedup_containment -------------------------------------------------------------


def test_containment_catches_planted_truncated_copies(spark):
    """The drop_last=2 planted copies are CONTAINED in their originals:
    every planted pair must surface with containment ~10000 bp even though
    the shingle sets differ (what Jaccard alone would score lower)."""
    from mongraph_spark.queries.dedup import ID_SHIFT, dedup_containment

    pairs = {(r.id_a, r.id_b): r.containment_bp for r in dedup_containment(spark, SF).collect()}
    planted = [(a, b) for (a, b) in pairs if b == a + ID_SHIFT]
    assert len(planted) > 0
    assert all(pairs[p] >= 9000 for p in planted)


# -- text_collocations -------------------------------------------------------------


def test_collocations_deterministic_topk(spark):
    """Top-50 by (lift, support, pair) is stable across runs and every row
    meets the support floor."""
    from mongraph_spark.queries.text import text_collocations

    a = [tuple(r) for r in text_collocations(spark, SF).collect()]
    b = [tuple(r) for r in text_collocations(spark, SF).collect()]
    assert a == b
    assert len(a) <= 50
    assert all(r[2] >= 5 for r in a)


# -- graph_node_similarity ---------------------------------------------------------


def test_node_similarity_bounds(spark):
    """Neighbor Jaccard is a proper [0, 1] similarity with the support
    floor applied, and the per-part counts broadcast (no extra shuffle of
    the pair table)."""
    from mongraph_spark.queries.graph_analytics import graph_node_similarity

    df = graph_node_similarity(spark, SF)
    assert "BroadcastHashJoin" in _plan(df)
    bad = df.filter(
        (F.col("jaccard_bp") < 0)
        | (F.col("jaccard_bp") > 10000)
        | (F.col("n_shared") < 2)
    ).count()
    assert bad == 0


# -- scd2_pit_join -----------------------------------------------------------------


def test_scd2_pit_join_matches_in_history_facts_once(spark):
    """SCD2 intervals partition the timeline FROM the customer's first
    version onward, so every fact shipping at-or-after its customer's first
    valid_from must match EXACTLY one version (this synthetic generator
    draws ship dates independently of order dates, so pre-history facts
    exist and legitimately have no version — they drop)."""
    from mongraph_spark.queries.relational import (
        scd2_pit_join,
        scd2_priority_history,
    )
    from mongraph_spark.sparkutil import read_table

    rows = scd2_pit_join(spark, SF).collect()

    first_vf = (
        scd2_priority_history(spark, SF)
        .groupBy("o_custkey")
        .agg(F.min(F.to_date("valid_from")).alias("first_vf"))
    )
    orders = read_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship_d"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )
    in_history = (
        li.join(orders, "l_orderkey")
        .join(first_vf, "o_custkey")
        .filter(F.col("ship_d") >= F.col("first_vf"))
    )
    expect = in_history.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev_cents").alias("cents")
    ).first()
    assert sum(r.n_lines for r in rows) == expect.n
    assert sum(r.revenue_cents for r in rows) == expect.cents


# -- pipeline_dataset_card ---------------------------------------------------------


def test_dataset_card_partitions_corpus(spark):
    """The card's (split, source) cells partition the corpus exactly: doc
    counts sum to the table size and token totals are consistent with the
    per-cell means."""
    from mongraph_spark.queries.pipeline import pipeline_dataset_card
    from mongraph_spark.sparkutil import read_table

    rows = pipeline_dataset_card(spark, SF).collect()
    n_docs = read_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.mean_tokens * r.n_docs <= r.total_tokens for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}


# -- mm_shard_packing --------------------------------------------------------------


def test_shard_packing_contiguous_and_conserving(spark):
    """Shards are contiguously numbered per source and byte totals are
    conserved (every asset lands in exactly one shard)."""
    from mongraph_spark.queries.multimodal import mm_shard_packing
    from mongraph_spark.sparkutil import read_table

    rows = mm_shard_packing(spark, SF).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for shards in by_source.values():
        seqs = sorted(s.shard_seq for s in shards)
        assert seqs == list(range(len(seqs)))
    total = sum(r.shard_bytes for r in rows)
    docs = read_table(spark, SF, "documents")
    expect = docs.agg(
        F.sum(16 * (F.col("n_chars") % 4 + 1)).cast("long")
    ).first()[0]
    assert total == expect


# -- embedding_covariance ----------------------------------------------------------


def test_covariance_upper_triangle_psd_diagonal(spark):
    """One-pass covariance emits the full upper triangle with non-negative
    variances on the diagonal."""
    from mongraph_spark.queries.similarity import COV_DIMS, embedding_covariance

    rows = embedding_covariance(spark, SF).collect()
    assert len(rows) == COV_DIMS * (COV_DIMS + 1) // 2
    diag = [r.cov for r in rows if r.dim_i == r.dim_j]
    assert len(diag) == COV_DIMS
    assert all(v is not None and v >= 0 for v in diag)


# -- events_ohlc_bars --------------------------------------------------------------


def test_ohlc_invariants_one_pass(spark):
    """OHLC bars come out of ONE aggregation (no window function, no
    per-window sort) and satisfy low <= open, close <= high on every bar."""
    from mongraph_spark.queries.events import events_ohlc_bars

    df = events_ohlc_bars(spark, SF)
    plan = _plan(df)
    assert "Window" not in plan
    bad = df.filter(
        (F.col("open_v") > F.col("high_v"))
        | (F.col("close_v") > F.col("high_v"))
        | (F.col("open_v") < F.col("low_v"))
        | (F.col("close_v") < F.col("low_v"))
    ).count()
    assert bad == 0


# -- streaming_threshold_anomaly ---------------------------------------------------


def test_streaming_anomaly_equals_batch(spark):
    """The availableNow replay of the streaming anomaly counter must agree
    with the batch twin's totals (the suite-wide streaming == batch
    contract)."""
    from mongraph_spark.queries.events import events_threshold_anomaly
    from mongraph_spark.streaming.events import streaming_threshold_anomaly

    stream_total = (
        streaming_threshold_anomaly(spark, SF).agg(F.sum("n_anomalies")).first()[0]
    )
    batch_total = (
        events_threshold_anomaly(spark, SF).agg(F.sum("n_anomalies")).first()[0]
    )
    assert stream_total == batch_total


# -- corpus_split_leakage ----------------------------------------------------------


def test_split_leakage_counts_every_verified_pair(spark):
    """The (split_a, split_b) cells partition the verified near-dup pair
    set: cell counts sum to dedup_ngram_jaccard's row count (identical
    candidates and threshold)."""
    from mongraph_spark.queries.corpus import split_leakage
    from mongraph_spark.queries.dedup import dedup_ngram_jaccard

    cells = split_leakage(spark, SF).collect()
    n_pairs = dedup_ngram_jaccard(spark, SF).count()
    assert sum(r.n_pairs for r in cells) == n_pairs
    # the planted corpus guarantees SOME cross-split leakage to report
    assert any(r.split_a != r.split_b for r in cells)


# -- streaming_click_purchase_outer ------------------------------------------------


def test_streaming_outer_join_counts_unconverted(spark):
    """The LEFT OUTER stream-stream join surfaces unconverted clicks (the
    inner join cannot), restricted to clicks whose join window the final
    watermark closed; totals match the batch left join under the same
    cutoff."""
    from mongraph_spark.sparkutil import read_table
    from mongraph_spark.streaming.events import streaming_click_purchase_outer

    rows = streaming_click_purchase_outer(spark, SF).collect()
    assert any(r.n_converted < r.n_clicks for r in rows)  # unconverted exist

    ev = read_table(spark, SF, "events")
    cut = ev.agg(
        (
            F.date_trunc(
                "second",
                F.least(
                    F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                    F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                ),
            )
            - F.expr("INTERVAL 91 MINUTES")
        ).alias("c")
    ).first()["c"]
    n_clicks_batch = (
        ev.filter((F.col("event_type") == "click") & (F.col("ts") < F.lit(cut))).count()
    )
    assert sum(r.n_clicks for r in rows) == n_clicks_batch
