"""Round-5d operators: seasonal anomaly, RFM segments, chi-square
independence, n-gram novelty, length-bucketed batching, PCA power
iteration, landmark betweenness.  Pins the properties the DuckDB oracle
cannot see — the oracle proves engine parity; these prove the MATH:
the PCA vector against numpy's eigendecomposition, Brandes against an
independent pure-Python implementation, and the conservation laws of
each rollup.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mongraph_spark.queries.corpus import corpus_ngram_novelty
from mongraph_spark.queries.events import (
    SEASONAL_BASELINE_DAYS,
    SEASONAL_Z2,
    events_seasonal_anomaly,
)
from mongraph_spark.queries.graph_analytics import (
    BETW_HOPS,
    BETW_K,
    BETW_SCALE,
    graph_betweenness_landmarks,
)
from mongraph_spark.queries.pipeline import (
    BATCH_SIZE,
    LEN_BUCKETS,
    pipeline_length_batches,
)
from mongraph_spark.queries.relational import (
    customer_rfm_segments,
    stats_chi2_independence,
)
from mongraph_spark.queries.similarity import (
    PCA_VSCALE,
    PCA_XQ,
    embedding_pca_power,
)
from mongraph_spark.sparkutil import read_table

SF = "/root/testdata/sf0.001"


# -- seasonal anomaly ---------------------------------------------------------


def test_seasonal_anomaly_flags_only_post_baseline_and_z2_exceeds(spark):
    rows = events_seasonal_anomaly(spark, SF).collect()
    ev = read_table(spark, SF, "events")
    d0 = ev.agg(F.min(F.to_date("ts"))).first()[0]
    for r in rows:
        # every flagged cell is outside the training window
        assert (np.datetime64(r.day) - np.datetime64(str(d0))).astype(int) >= (
            SEASONAL_BASELINE_DAYS
        )
        assert 0 <= r.hr < 24
        # when the baseline had variance, the quantized z^2 must clear the gate
        if r.z2_bp is not None:
            assert r.z2_bp >= SEASONAL_Z2 * 10000


# -- RFM ----------------------------------------------------------------------


def test_rfm_segments_partition_customers_with_valid_digits(spark):
    rows = customer_rfm_segments(spark, SF).collect()
    n_cust = (
        read_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        digs = (r.segment // 100, (r.segment // 10) % 10, r.segment % 10)
        assert all(1 <= d <= 5 for d in digs), r.segment
        assert r.n_customers > 0 and r.sum_orders >= r.n_customers


# -- chi-square ---------------------------------------------------------------


def test_chi2_cells_conserve_counts_and_expected(spark):
    rows = stats_chi2_independence(spark, SF).collect()
    n_orders = read_table(spark, SF, "orders").count()
    assert sum(r.obs for r in rows) == n_orders
    # expected counts (e4 fixed point) reconstruct the total up to floor loss
    tot_e4 = sum(r.expected_e4 for r in rows)
    assert 10000 * n_orders - len(rows) <= tot_e4 <= 10000 * n_orders
    assert all(r.chi2_bp >= 0 for r in rows)


# -- n-gram novelty -----------------------------------------------------------


def test_novelty_conserves_distinct_shingles_and_decays(spark):
    df = corpus_ngram_novelty(spark, SF)
    rows = df.collect()
    # every distinct shingle is novel exactly once, in its first document
    con = duckdb.connect()
    n_distinct = con.execute(
        f"""
        SELECT count(DISTINCT shingle) FROM (
          SELECT unnest(list_transform(
            range(1, greatest(len(words) - 5, 0) + 2),
            i -> array_to_string(words[i:i+4], ' '))) AS shingle
          FROM (SELECT string_split(text, ' ') AS words
                FROM '{SF}/documents.parquet'))
        """
    ).fetchone()[0]
    assert sum(r.n_novel for r in rows) == n_distinct
    # planted near-dup copies carry high doc_ids -> the corpus tail must be
    # far less novel than the head
    head = sum(r.n_novel for r in rows if r.decile == 0) / max(
        1, sum(r.n_shingles for r in rows if r.decile == 0)
    )
    tail = sum(r.n_novel for r in rows if r.decile == 9) / max(
        1, sum(r.n_shingles for r in rows if r.decile == 9)
    )
    assert head > tail


# -- length-bucketed batching -------------------------------------------------


def test_length_batches_conserve_docs_and_batch_arithmetic(spark):
    rows = pipeline_length_batches(spark, SF).collect()
    n_docs = read_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.bucket in LEN_BUCKETS
        assert r.n_batches == -(-r.n_docs // BATCH_SIZE)  # ceil division
        assert 0 < r.fill_bp <= 10000
        assert r.waste_tokens >= 0


# -- PCA power iteration ------------------------------------------------------


def test_pca_matches_numpy_eigendecomposition(spark):
    rows = sorted(embedding_pca_power(spark, SF).collect(), key=lambda r: r.dim)
    v = np.array([r.v_e6 for r in rows], dtype=float) / PCA_VSCALE
    assert len(rows) == 64
    assert max(abs(x) for x in v) == pytest.approx(1.0)  # max-norm normalized
    # rebuild the EXACT integer scatter matrix and compare directions
    con = duckdb.connect()
    X = np.array(
        con.execute(
            f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist()
    )
    Xq = np.floor(PCA_XQ * X.astype(np.float64)).astype(np.int64)
    n = Xq.shape[0]
    m = np.floor(Xq.sum(axis=0) / n).astype(np.int64)
    C = Xq - m
    S = C.T @ C
    lam, vecs = np.linalg.eigh(S.astype(float))
    top = vecs[:, -1]
    cos = abs(top @ v) / (np.linalg.norm(top) * np.linalg.norm(v))
    assert cos > 0.99  # lam1/lam2 ~ 1.07 on this corpus; 48 rounds -> 0.996
    # reported eigenvalue share is consistent with numpy's
    ev_bp = rows[0].ev_bp
    assert ev_bp == pytest.approx(10000 * lam[-1] / np.trace(S), abs=150)


# -- landmark betweenness -----------------------------------------------------


def _python_brandes(edges, landmarks, hops, scale):
    """Independent fixed-point Brandes with the SAME truncation contract."""
    from collections import defaultdict

    adj = defaultdict(set)
    for c, s in edges:
        adj[c].add(s)
        adj[s].add(c)
    bc = defaultdict(int)
    seen_by = defaultdict(int)
    for lm in landmarks:
        layers = [{lm: 1}]
        visited = {lm}
        for _ in range(hops):
            nxt = defaultdict(int)
            for v, sig in layers[-1].items():
                for w in adj[v]:
                    if w not in visited:
                        nxt[w] += sig
            layers.append(dict(nxt))
            visited |= set(nxt)
        delta = {v: 0 for v in layers[hops]}
        for d in range(hops - 1, 0, -1):
            nd = {}
            for v, sig in layers[d].items():
                acc = 0
                for w in adj[v]:
                    if w in layers[d + 1]:
                        acc += (sig * (scale + delta[w])) // layers[d + 1][w]
                nd[v] = acc
            for v, dv in nd.items():
                bc[v] += dv
                seen_by[v] += 1
            delta = nd
    return bc, seen_by


def test_betweenness_matches_independent_python_brandes(spark):
    rows = graph_betweenness_landmarks(spark, SF).collect()
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
          ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    landmarks = sorted({s for _, s in edges})[:BETW_K]
    bc, seen_by = _python_brandes(edges, landmarks, BETW_HOPS, BETW_SCALE)
    expected = {v: d for v, d in bc.items() if d > 0}
    got = {r.node_id: r.bc_e6 for r in rows}
    assert got == expected
    for r in rows:
        assert r.n_landmarks == seen_by[r.node_id]
        assert 1 <= r.n_landmarks <= BETW_K
