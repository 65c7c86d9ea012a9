"""Round-5b operators: semantic invariants + plan pins for boilerplate
segment removal, the C4 filter funnel, the mergeable HLL sketch, activity
streak islands, the multi-epoch shuffle, Adamic-Adar, MMR retrieval, and
bloom-filter skipping.  (Oracle equality for all of these is the strict
gate; these tests pin the invariants the oracle can't see — mergeability,
no-false-negative, plan shape.)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mongraph_spark.queries.corpus import (
    SEG_WORDS,
    boilerplate_lines,
    filter_funnel,
)
from mongraph_spark.queries.events import events_activity_streaks
from mongraph_spark.queries.graph_analytics import (
    AA_HUB_CAP,
    graph_adamic_adar,
    graph_copurchase_pairs,
)
from mongraph_spark.queries.pipeline import (
    EPOCH_HEAD,
    N_EPOCHS,
    pipeline_epoch_shuffle,
)
from mongraph_spark.queries.quality import BLOOM_NB, bloom_filter_skipping
from mongraph_spark.queries.relational import HLL_M, sketch_hll_mergeable
from mongraph_spark.queries.similarity import (
    MMR_K,
    MMR_REL_W,
    ann_mmr_diversified,
)
from mongraph_spark.sparkutil import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- boilerplate segments -----------------------------------------------------


def test_boilerplate_segment_conservation(spark):
    rows = boilerplate_lines(spark, SF).collect()
    docs = read_table(spark, SF, "documents")
    expected_segs = docs.select(
        F.ceil(F.size(F.split("text", " ")) / SEG_WORDS).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    assert sum(r.n_segments for r in rows) == expected_segs
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.n_boilerplate <= r.n_segments
        assert 0 <= r.bp_ratio_bp <= 10000


def test_boilerplate_no_cartesian(spark):
    plan = _plan(boilerplate_lines(spark, SF))
    assert "CartesianProduct" not in plan


# -- filter funnel ------------------------------------------------------------


def test_filter_funnel_chain_and_single_scan(spark):
    rows = {r.stage: r for r in filter_funnel(spark, SF).collect()}
    docs = read_table(spark, SF, "documents")
    assert rows[1].entered == docs.count()
    for s in range(1, 6):
        assert 0 <= rows[s].survivors <= rows[s].entered
        assert rows[s].dropped == rows[s].entered - rows[s].survivors
        if s > 1:
            assert rows[s].entered == rows[s - 1].survivors
    plan = _plan(filter_funnel(spark, SF))
    assert plan.count("documents.parquet") <= 1  # one scan feeds all five rules


# -- HLL sketch ---------------------------------------------------------------


def test_hll_merge_dominates_and_brackets_exact(spark):
    rows = {r.scope: r for r in sketch_hll_mergeable(spark, SF).collect()}
    assert "ALL" in rows
    merged = rows.pop("ALL")
    for r in rows.values():
        # register-wise max ⇒ merged harmonic denominator can only shrink
        assert merged.harm_int <= r.harm_int
        assert 0 <= r.v_zero <= HLL_M
    assert merged.exact_distinct == max(
        r.exact_distinct for r in rows.values()
    ) or merged.exact_distinct >= max(r.exact_distinct for r in rows.values())
    # m=64 ⇒ ~13% standard error; 3x bracket is a safe invariant at any SF
    for r in list(rows.values()) + [merged]:
        assert r.exact_distinct / 3 <= r.est_x100 / 100 <= r.exact_distinct * 3


# -- activity streaks ---------------------------------------------------------


def test_streaks_conserve_active_days(spark):
    rows = events_activity_streaks(spark, SF).collect()
    ev = read_table(spark, SF, "events")
    active_days = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct().count()
    )
    assert sum(r.streak_len * r.n_streaks for r in rows) == active_days
    for r in rows:
        assert r.n_users <= r.n_streaks


def test_streaks_bounded_exchanges(spark):
    plan = _plan(events_activity_streaks(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


# -- epoch shuffle ------------------------------------------------------------


def test_epoch_shuffle_distinct_permutations_topk_plan(spark):
    rows = pipeline_epoch_shuffle(spark, SF).collect()
    assert len(rows) == N_EPOCHS * EPOCH_HEAD
    orders = {}
    for e in range(N_EPOCHS):
        orders[e] = [r.doc_id for r in sorted(rows, key=lambda r: r.pos) if r.epoch == e]
        assert len(orders[e]) == EPOCH_HEAD
        assert len(set(orders[e])) == EPOCH_HEAD
    # different epochs yield different heads (md5 reshuffle actually shuffles)
    assert orders[0] != orders[1] and orders[1] != orders[2]
    plan = _plan(pipeline_epoch_shuffle(spark, SF))
    assert "TakeOrderedAndProject" in plan  # per-epoch head is top-k, not a sort


# -- Adamic-Adar --------------------------------------------------------------


def test_adamic_adar_predicts_only_new_links(spark):
    aa = graph_adamic_adar(spark, SF)
    pairs = graph_copurchase_pairs(spark, SF)
    overlap = aa.join(pairs, ["part_a", "part_b"]).count()
    assert overlap == 0  # scores only NON-edges (link prediction, not weighting)
    rows = aa.collect()
    assert len(rows) <= 100
    for r in rows:
        assert r.n_common >= 1
        # each common neighbor contributes at most floor(10000/ln 2)
        assert r.aa_bp <= r.n_common * math.floor(10000 / math.log(2))
        assert r.aa_bp >= r.n_common * math.floor(10000 / math.log(AA_HUB_CAP))


# -- MMR ----------------------------------------------------------------------


def test_mmr_greedy_invariants(spark):
    rows = sorted(ann_mmr_diversified(spark, SF).collect(), key=lambda r: r.step)
    assert [r.step for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.c_id for r in rows}) == MMR_K
    # step 1 is the pure-relevance argmax, scored with zero diversity penalty
    assert rows[0].mmr_x10 == MMR_REL_W * rows[0].rel_bp
    assert rows[0].rel_bp == max(r.rel_bp for r in rows)
    for r in rows[1:]:
        # penalty term is bounded by ±3·10000 (cos similarity can be negative)
        assert abs(r.mmr_x10 - MMR_REL_W * r.rel_bp) <= 3 * 10000


# -- bloom skipping -----------------------------------------------------------


def test_bloom_no_false_negatives_and_skips(spark):
    rows = bloom_filter_skipping(spark, SF).collect()
    present = [r for r in rows if r.n_actual == 1]
    absent = [r for r in rows if r.n_actual == 0]
    for r in rows:
        assert r.n_maybe + r.n_skipped == BLOOM_NB
    # a key's own bucket always passes its bloom (no false negatives)
    assert all(r.n_maybe >= 1 for r in present)
    if absent:
        # the filter must actually skip: absent keys read well under half
        assert sum(r.n_maybe for r in absent) / len(absent) < BLOOM_NB / 4
