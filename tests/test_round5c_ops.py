"""Round-5c operators: prefix-filter set-similarity join and the mergeable
histogram quantile sketch.  Pins the properties the oracle can't see:
exact recall (prefix filtering has NO false negatives, unlike LSH) and
sketch-vs-exact error bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongraph_spark.queries.dedup import (
    _shingled_corpus,
    dedup_prefix_filter,
)
from mongraph_spark.queries.relational import (
    HIST_BINS,
    sketch_histogram_quantiles,
)
from mongraph_spark.sparkutil import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- prefix filter ------------------------------------------------------------


def test_prefix_filter_exact_recall(spark):
    """Prefix filtering must find EVERY pair with token-Jaccard >= 0.8 —
    verified against the brute-force all-pairs answer (tiny SF only)."""
    found = {
        (r.id_a, r.id_b) for r in dedup_prefix_filter(spark, SF).collect()
    }
    toks = _shingled_corpus(spark, SF, drop_last=2).select(
        "doc_id", F.col("shingles").alias("toks")
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(5 * inter >= 4 * union)
        .collect()
    }
    assert truth, "fixture must plant at least one near-dup pair"
    assert found == truth  # zero false negatives AND zero false positives


def test_prefix_filter_finds_planted_dups(spark):
    rows = dedup_prefix_filter(spark, SF).collect()
    n_docs = read_table(spark, SF, "documents").count()
    # every original doc and its drop-2-words copy is a planted near-dup
    planted = {(r.id_a, r.id_b) for r in rows if r.id_b == r.id_a + 1_000_000}
    assert len(planted) >= n_docs * 0.9  # a couple of tiny docs may dip below 0.8
    for r in rows:
        assert 8000 <= r.jaccard_bp <= 10000


# -- histogram quantile sketch ------------------------------------------------


def test_histogram_sketch_error_bounded_by_bin_width(spark):
    rows = sketch_histogram_quantiles(spark, SF).collect()
    ev = read_table(spark, SF, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    lo, hi = ev.agg(F.min("cents"), F.max("cents")).collect()[0]
    bin_width = (hi - lo + 1) / HIST_BINS
    scopes = {r.scope for r in rows}
    assert "ALL" in scopes and len(scopes) >= 2
    for r in rows:
        for q in (50, 90, 99):
            est, exact = getattr(r, f"p{q}_est"), getattr(r, f"p{q}_exact")
            # the lower bin edge can undershoot by at most one bin width
            assert est <= exact < est + 2 * bin_width


def test_histogram_merge_is_count_sum(spark):
    rows = {r.scope: r for r in sketch_histogram_quantiles(spark, SF).collect()}
    ev = read_table(spark, SF, "events")
    # the ALL row's exact percentiles come from the union of all scopes:
    # its p50 must lie within the min..max of the per-scope p50s
    per = [r.p50_exact for s, r in rows.items() if s != "ALL"]
    assert min(per) <= rows["ALL"].p50_exact <= max(per)


# -- edge support & recall report ---------------------------------------------


def test_edge_support_sums_to_three_triangles(spark):
    """Every triangle contributes +1 support to each of its 3 edges, so
    Σ support·n_edges == 3 × the independently-computed triangle count."""
    from mongraph_spark.queries.graph_analytics import (
        graph_edge_support,
        graph_triangle_count,
    )

    hist = graph_edge_support(spark, SF).collect()
    total_support = sum(r.support * r.n_edges for r in hist)
    tri = graph_triangle_count(spark, SF).collect()[0].n_triangles
    assert total_support == 3 * tri


def test_recall_report_prefix_is_exact_lsh_bounded(spark):
    from mongraph_spark.queries.dedup import dedup_recall_report

    rows = {r.method: r for r in dedup_recall_report(spark, SF).collect()}
    assert rows["prefix_filter"].recall_bp == 10000  # exact by theorem
    assert rows["prefix_filter"].n_hit == rows["prefix_filter"].n_truth
    lsh = rows["minhash_lsh_jaccard"]
    assert 9000 <= lsh.recall_bp <= 10000  # banding misses are rare, not common


# -- late-data audit & A/B lift -----------------------------------------------


def test_late_audit_conserves_events(spark):
    from mongraph_spark.queries.events import events_late_data_audit

    rows = events_late_data_audit(spark, SF).collect()
    total = read_table(spark, SF, "events").count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        assert r.max_late_us >= 0


def test_ab_lift_partitions_users_and_brackets_rate(spark):
    from mongraph_spark.queries.events import events_ab_lift

    rows = events_ab_lift(spark, SF).collect()
    assert {r.arm for r in rows} == {0, 1}
    n_users = read_table(spark, SF, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.wilson_lo_bp <= r.rate_bp <= r.wilson_hi_bp <= 10000


def test_psi_nonnegative_stationary_and_conserving(spark):
    from mongraph_spark.queries.quality import quality_drift_psi

    rows = quality_drift_psi(spark, SF).collect()
    ev = read_table(spark, SF, "events")
    totals = {r.event_type: r.n for r in ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert {r.event_type for r in rows} == set(totals)
    for r in rows:
        assert r.n_ref + r.n_cur == totals[r.event_type]
        # (p-q)·ln(p/q) >= 0 per bin, so PSI is non-negative by construction
        assert r.psi_x1e6 >= 0
        # the synthetic stream is stationary: no type should flag drift
        assert r.drift_flag == 0 and r.psi_x1e6 < 100_000
