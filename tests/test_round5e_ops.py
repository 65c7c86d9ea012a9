"""Round-5e operators: user Gini, double-sweep diameter, Heaps law,
PQ codebooks, modularity, cosine range search, streaming seasonal twin
(its batch-equality pin lives in test_streaming).  Independent math
checks + conservation laws the engine-parity oracle can't see."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mongraph_spark.queries.corpus import corpus_heaps_law
from mongraph_spark.queries.events import events_user_gini
from mongraph_spark.queries.graph_analytics import (
    graph_diameter_double_sweep,
    graph_label_propagation,
    graph_modularity,
)
from mongraph_spark.queries.similarity import (
    PQ_K,
    PQ_M,
    RANGE_TAU_BP,
    ann_cosine_topk,
    ann_range_search,
    embedding_pq_codebooks,
)
from mongraph_spark.sparkutil import read_table

SF = "/root/testdata/sf0.001"


def test_gini_matches_independent_python(spark):
    row = events_user_gini(spark, SF).collect()[0]
    con = duckdb.connect()
    xs = sorted(
        n
        for (n,) in con.execute(
            f"SELECT count(*) FROM '{SF}/events.parquet' GROUP BY user_id"
        ).fetchall()
    )
    n, tot = len(xs), sum(xs)
    gini = (10000 * (2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * tot)) // (
        n * tot
    )
    top = sum(xs[n - n // 10 :])
    assert row.n_users == n and row.total_events == tot
    assert row.gini_bp == gini
    assert row.top_decile_bp == (10000 * top) // tot
    assert 0 <= row.gini_bp <= 10000


def test_diameter_double_sweep_properties(spark):
    row = graph_diameter_double_sweep(spark, SF).collect()[0]
    # eccentricity can only grow on the second sweep (d(s,u) = ecc(s) <= ecc(u))
    assert row.diameter_lb >= row.ecc_seed >= 1
    # connected bipartite graph: both sweeps reach the same component
    assert row.n_reached_far == row.n_reached_seed
    assert row.far_node % 2 == 0  # farthest node from a supplier is a customer
    # (parity encoding: even=customer; odd depth from odd seed lands even)


def test_heaps_curve_monotone_and_conserving(spark):
    rows = sorted(corpus_heaps_law(spark, SF).collect(), key=lambda r: r.decile)
    con = duckdb.connect()
    n_vocab, n_tok = con.execute(
        f"""
        SELECT count(DISTINCT w), count(*) FROM (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM '{SF}/documents.parquet')
        """
    ).fetchone()
    assert rows[-1].cum_vocab == n_vocab
    assert rows[-1].cum_tokens == n_tok
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens > a.cum_tokens and b.cum_vocab >= a.cum_vocab
    # sublinear growth; the sf0.001 corpus's ~31-word vocab saturates in the
    # first decile, so the fitted slope can be exactly 0
    assert 0 <= rows[0].beta_micro < 1_000_000


def test_pq_codebooks_partition_and_valid_codes(spark):
    rows = embedding_pq_codebooks(spark, SF).collect()
    n_vecs = read_table(spark, SF, "embeddings").count()
    per_m = {}
    for r in rows:
        assert 0 <= r.code < PQ_K and 0 <= r.m < PQ_M
        assert r.sum_distort_micro >= 0
        per_m[r.m] = per_m.get(r.m, 0) + r.n_vectors
    assert per_m == {m: n_vecs for m in range(PQ_M)}


def test_modularity_consistent_with_lpa_and_bounded(spark):
    mod = graph_modularity(spark, SF).collect()
    lpa = {
        (r.community, r.n_members)
        for r in graph_label_propagation(spark, SF).collect()
    }
    assert {(r.community, r.n_members) for r in mod} == lpa
    q = {r.modularity_micro for r in mod}
    assert len(q) == 1  # one global statistic
    q_global = q.pop()
    assert -1_000_000 <= q_global <= 1_000_000
    for r in mod:
        assert r.intra_edges <= r.degree_sum  # e_c <= sum of member degrees
    # per-community contributions reconstruct the global Q (communities of
    # size 1 are filtered from the output but contribute only their own
    # -d_c^2 term; the displayed rows must still each stay within bounds
    # and sum to <= the global, since dropped singleton terms are <= 0)
    assert all(-1_000_000 <= r.q_c_micro <= 1_000_000 for r in mod)
    assert sum(r.q_c_micro for r in mod) >= q_global - len(mod)  # floor slack


def test_range_search_consistent_with_topk(spark):
    rng = ann_range_search(spark, SF).collect()
    for r in rng:
        assert r.cos_bp >= RANGE_TAU_BP
    counts = {}
    for r in rng:
        counts[r.q_id] = counts.get(r.q_id, 0) + 1
    for r in rng:
        assert r.n_matches == counts[r.q_id]
    # every top-k hit above the threshold must appear in the range result
    got = {(r.q_id, r.c_id) for r in rng}
    for r in ann_cosine_topk(spark, SF).collect():
        if r.cos_bp >= RANGE_TAU_BP:
            assert (r.q_id, r.c_id) in got


def test_pq_adc_topk_shape_and_recall(spark):
    from mongraph_spark.queries.similarity import PQ_ADC_K, ann_pq_adc_topk

    rows = ann_pq_adc_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, PQ_ADC_K + 1))
        # ADC scores are non-decreasing with rank (integer sums, exact)
        assert all(a.adc_micro <= b.adc_micro for a, b in zip(rs, rs[1:]))
    # quantized retrieval finds a meaningful share of the EXACT L2 top-k
    # (ADC approximates L2; cosine is a different metric on these
    # unnormalized vectors, so L2 truth is the right recall reference)
    import numpy as np

    from mongraph_spark.queries.similarity import N_QUERIES

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in read_table(spark, SF, "embeddings").collect()
    }
    truth = set()
    for q in range(N_QUERIES):
        d = sorted(
            (float(np.sum((emb[q] - v) ** 2)), c)
            for c, v in emb.items()
            if c != q
        )
        truth |= {(q, c) for _, c in d[:PQ_ADC_K]}
    got = {(r.q_id, r.c_id) for r in rows}
    recall = len(truth & got) / len(truth)
    # Near-isotropic random vectors are PQ's worst case (no cluster
    # structure to quantize onto): an independent numpy replication of the
    # same pipeline measures 0.18 recall at 1 Lloyd round — exactly what
    # this operator returns — and only 0.26 even at 8 full rounds.  Pin
    # well above the 0.02 random baseline and at the measured level.
    assert recall >= 0.14, recall


def test_bpe_tokenize_matches_independent_python(spark):
    """The chained-replace tokenizer must equal a literal Python replay of
    BPE inference (apply each merge to all occurrences, in order)."""
    from mongraph_spark.queries.text import BPE_MERGES, text_bpe_tokenize

    rows = {r.source: r for r in text_bpe_tokenize(spark, SF).collect()}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = {}
    for source, text in docs:
        spaced = "".join(c + " " for c in text.lower())
        for a, b in BPE_MERGES:
            spaced = spaced.replace(f"{a} {b}", f"{a}{b}")
        n_bpe = len(spaced.split())
        n_words = len(text.lower().split())
        d = agg.setdefault(source, [0, 0, 0])
        d[0] += 1
        d[1] += n_words
        d[2] += n_bpe
    assert set(rows) == set(agg)
    for source, (n_docs, n_words, n_bpe) in agg.items():
        r = rows[source]
        assert (r.n_docs, r.n_words, r.n_bpe_tokens) == (n_docs, n_words, n_bpe)
        # merges actually compress: fewer units than raw characters,
        # more than whitespace words
        assert n_words < r.n_bpe_tokens
        assert r.fertility_bp == (10000 * n_bpe) // n_words


def test_ktruss_matches_independent_python_peel(spark):
    """Every peel round's survivor count must equal an independent Python
    k-truss peel on the same co-purchase graph, and the unroll must reach
    the fixed point."""
    from collections import defaultdict

    from mongraph_spark.queries.graph_analytics import (
        KTRUSS_K,
        KTRUSS_ROUNDS,
        graph_ktruss,
    )

    rows = {r.round: r.n_edges for r in graph_ktruss(spark, SF).collect()}
    assert sorted(rows) == list(range(KTRUSS_ROUNDS + 1))
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH el AS (SELECT DISTINCT o_orderkey AS oid, l_partkey AS part
          FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
            ON o.o_orderkey = l.l_orderkey)
        SELECT a.part, b.part FROM el a JOIN el b
          ON a.oid = b.oid AND a.part < b.part
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    E = set(edges)
    expect = {0: len(E)}
    for r in range(1, KTRUSS_ROUNDS + 1):
        adj = defaultdict(set)
        for a, b in E:
            adj[a].add(b)
            adj[b].add(a)
        E = {(a, b) for a, b in E if len(adj[a] & adj[b]) >= KTRUSS_K - 2}
        expect[r] = len(E)
    assert rows == expect
    assert rows[KTRUSS_ROUNDS] == rows[KTRUSS_ROUNDS - 1]  # fixed point


def test_ks_test_matches_independent_python(spark):
    from mongraph_spark.queries.relational import (
        KS_SEG_A,
        KS_SEG_B,
        stats_ks_test,
    )

    row = stats_ks_test(spark, SF).collect()[0]
    con = duckdb.connect()
    data = con.execute(
        f"""
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, c_mktsegment
        FROM '{SF}/orders.parquet' o JOIN '{SF}/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
        """
    ).fetchall()
    a = sorted(v for v, s in data if s == KS_SEG_A)
    b = sorted(v for v, s in data if s == KS_SEG_B)
    n1, n2 = len(a), len(b)
    best, at = -1, None
    ca = cb = 0
    import itertools

    for v in sorted(set(a) | set(b)):
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        term = abs(n2 * ca - n1 * cb)
        if term > best:
            best, at = term, v
    assert (row.n1, row.n2) == (n1, n2)
    assert row.d_bp == (10000 * best) // (n1 * n2)
    assert row.at_value_cents == at


def test_markov_surprise_top_list_properties(spark):
    from mongraph_spark.queries.events import (
        SURPRISE_TOP,
        events_markov_surprise,
    )

    rows = events_markov_surprise(spark, SF).collect()
    n_users = read_table(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == min(SURPRISE_TOP, n_users)
    cbs = [r.mean_surprise_cb for r in rows]
    assert cbs == sorted(cbs, reverse=True)
    assert all(c >= 0 for c in cbs)  # surprisal of p<=1 is non-negative
    assert all(r.n_steps >= 1 for r in rows)


def test_assortativity_bounded_and_edge_count_consistent(spark):
    from mongraph_spark.queries.graph_analytics import graph_assortativity

    row = graph_assortativity(spark, SF).collect()[0]
    assert -1_000_000 <= row.assortativity_micro <= 1_000_000
    con = duckdb.connect()
    n_pairs = con.execute(
        f"""
        SELECT count(*) FROM (
          SELECT a.part, b.part FROM
            (SELECT DISTINCT o_orderkey AS oid, l_partkey AS part
             FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
               ON o.o_orderkey = l.l_orderkey) a
          JOIN (SELECT DISTINCT o_orderkey AS oid, l_partkey AS part
                FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
                  ON o.o_orderkey = l.l_orderkey) b
            ON a.oid = b.oid AND a.part < b.part
          GROUP BY 1, 2 HAVING count(*) >= 2)
        """
    ).fetchone()[0]
    assert row.n_directed_edges == 2 * n_pairs


def test_burstiness_partitions_and_classes(spark):
    from mongraph_spark.queries.events import events_burstiness

    rows = events_burstiness(spark, SF).collect()
    for r in rows:
        assert r.n_bursty + r.n_periodic <= r.n_users
        assert r.mean_cv2_bp >= 0
        assert r.n_gaps >= r.n_users  # each counted user has >= 19 gaps


def test_band_join_equals_bruteforce(spark):
    """The bucketed band join must find EXACTLY the brute-force pair set
    (the adjacent-bucket emission covers every band pair; canonicalization
    loses none)."""
    from mongraph_spark.queries.relational import (
        BAND_CENTS,
        band_join_close_prices,
    )

    got = {
        (r.prio_a, r.prio_b): r.n_close_pairs
        for r in band_join_close_prices(spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH o AS (SELECT o_orderkey k, o_orderpriority p,
                          CAST(round(o_totalprice*100) AS BIGINT) v
                   FROM '{SF}/orders.parquet')
        SELECT least(a.p, b.p), greatest(a.p, b.p), count(*)
        FROM o a JOIN o b ON a.k < b.k AND abs(a.v - b.v) <= {BAND_CENTS}
        GROUP BY 1, 2
        """
    ).fetchall()
    assert got == {(a, b): n for a, b, n in rows}


def test_zorder_pruning_beats_single_column_sort(spark):
    """The whole point of the Morton layout, measured: on a 2-D box
    workload it must scan no MORE files than the day-sorted layout
    (measured at sf0.01: 60 vs 82 of 256x20)."""
    from mongraph_spark.queries.quality import (
        PRUNE_FILES,
        zorder_pruning_benefit,
    )

    rows = {r.layout: r for r in zorder_pruning_benefit(spark, SF).collect()}
    assert set(rows) == {"zorder", "day_sorted"}
    for r in rows.values():
        assert r.n_files == PRUNE_FILES
        assert 0 < r.files_scanned_total <= r.n_files * r.n_queries
    assert (
        rows["zorder"].files_scanned_total
        <= rows["day_sorted"].files_scanned_total
    )


def test_itemsets3_downward_closure_and_bruteforce(spark):
    """Every reported triple must match the brute-force count, and its
    confidence denominator must be the exact (a,b) pair support."""
    from mongraph_spark.queries.graph_analytics import (
        ITEMSET3_MIN_SUPPORT,
        graph_itemsets3,
    )

    rows = graph_itemsets3(spark, SF).collect()
    con = duckdb.connect()
    brute = {
        (a, b, c): s
        for a, b, c, s in con.execute(
            f"""
            WITH el AS (SELECT DISTINCT o_orderkey AS oid, l_partkey AS part
              FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
                ON o.o_orderkey = l.l_orderkey)
            SELECT a.part, b.part, c.part, count(*)
            FROM el a JOIN el b ON a.oid = b.oid AND a.part < b.part
                      JOIN el c ON a.oid = c.oid AND b.part < c.part
            GROUP BY 1, 2, 3 HAVING count(*) >= {ITEMSET3_MIN_SUPPORT}
            """
        ).fetchall()
    }
    # graph-store node ids are namespaced: part -> code*10^12 + partkey
    from mongraph_spark.graphs.tpch import _CODE_BASE

    def raw(x):
        return x % _CODE_BASE

    got = {
        (raw(r.part_a), raw(r.part_b), raw(r.part_c)): r.support for r in rows
    }
    assert got == brute
    for r in rows:
        assert 0 < r.conf_ab_to_c_bp <= 10000  # support3 <= pair support


def test_ivm_identity_holds_everywhere(spark):
    from mongraph_spark.queries.relational import ivm_join_delta

    rows = ivm_join_delta(spark, SF).collect()
    assert rows and all(r.identity_holds for r in rows)
    for r in rows:
        assert r.n_maintained == r.n_full
        # deltas are a proper split: every term strictly smaller than full
        assert max(r.n_old, r.n_da_b, r.n_a_db, r.n_da_db) < r.n_full


def test_tar_index_frames_are_contiguous_and_block_aligned(spark):
    from mongraph_spark.queries.multimodal import TAR_BLOCK, mm_tar_index

    rows = mm_tar_index(spark, SF).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r.source, r.shard_seq), []).append(r)
    for (_, _), members in by_shard.items():
        members.sort(key=lambda r: r.doc_id)
        expect = 0
        for m in members:
            # entries tile the archive with no gaps or overlaps
            assert m.offset_bytes == expect
            assert m.offset_bytes % TAR_BLOCK == 0
            assert m.entry_bytes % TAR_BLOCK == 0 and m.entry_bytes >= 2 * TAR_BLOCK
            expect += m.entry_bytes


def test_curation_funnel_monotone_and_consistent(spark):
    from mongraph_spark.queries.dedup import dup_corpus
    from mongraph_spark.queries.pipeline import pipeline_curation_funnel

    rows = sorted(
        pipeline_curation_funnel(spark, SF).collect(), key=lambda r: r.stage_idx
    )
    assert [r.stage for r in rows] == ["raw", "canonical", "quality", "train"]
    assert rows[0].n_docs == dup_corpus(spark, SF, drop_last=1).count()
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs < a.n_docs  # every stage removes something
        assert b.n_tokens <= a.n_tokens
    # near-dup stage removes roughly the planted half of the corpus
    assert rows[1].n_docs < 0.7 * rows[0].n_docs


def test_weighted_median_matches_independent_python(spark):
    from mongraph_spark.queries.relational import stats_weighted_median

    rows = {r.o_orderpriority: r for r in stats_weighted_median(spark, SF).collect()}
    con = duckdb.connect()
    data = con.execute(
        f"""
        SELECT o_orderpriority, CAST(round(l_extendedprice*100) AS BIGINT) v,
               CAST(l_quantity AS BIGINT) w
        FROM '{SF}/lineitem.parquet' l JOIN '{SF}/orders.parquet' o
          ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    by_p = {}
    for p, v, w in data:
        by_p.setdefault(p, []).append((v, w))
    for p, vw in by_p.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= tot:
                assert rows[p].weighted_median_cents == v
                break
        assert rows[p].total_quantity == tot


def test_bipartite_squares_counts_consistent(spark):
    from mongraph_spark.queries.graph_analytics import graph_bipartite_squares

    rows = {r.side: r for r in graph_bipartite_squares(spark, SF).collect()}
    assert set(rows) == {"customer", "supplier"}
    for r in rows.values():
        assert 0 <= r.n_pairs_squared <= r.n_pairs_connected
        assert r.n_squares >= r.n_pairs_squared  # C(cn,2) >= 1 when cn >= 2
        assert 0 <= r.closure_bp <= 10000
    # supplier side is the exact census; the customer side is a
    # deterministic md5 node-sample (sample_bp records the rate), so its
    # within-sample C4 count is bounded by the exact total (every sampled
    # C4 is a real C4, counted exactly once on the supplier side)
    assert rows["supplier"].sample_bp == 10000
    from mongraph_spark.queries.graph_analytics import SQ_SAMPLE_PCT

    assert rows["customer"].sample_bp == SQ_SAMPLE_PCT * 100
    assert rows["customer"].n_squares <= rows["supplier"].n_squares


def test_benford_rows_complete_and_shares_sum(spark):
    from mongraph_spark.queries.relational import BENFORD_BP, stats_benford_test

    rows = {r.digit: r for r in stats_benford_test(spark, SF).collect()}
    assert set(rows) <= set(range(1, 10))
    tot_bp = sum(r.observed_bp for r in rows.values())
    assert 10000 - 9 <= tot_bp <= 10000  # floor loss only
    for d, r in rows.items():
        assert r.benford_bp == BENFORD_BP[d]
        assert r.abs_dev_bp == abs(r.observed_bp - r.benford_bp)


def test_dau_wau_invariants(spark):
    from mongraph_spark.queries.events import events_dau_wau

    rows = sorted(events_dau_wau(spark, SF).collect(), key=lambda r: r.day)
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau  # a day's actives are a subset of the week's
        assert 0 < r.stickiness_bp <= 10000
    # trailing window ramps up: first day WAU == DAU
    assert rows[0].wau == rows[0].dau
