"""Round-6 operators: exact substring-span dedup (planted-span recall,
run-length arithmetic, maximality), sliding-HLL DAU/WAU error bound.
Independent math checks the engine-parity oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongraph_spark.queries.dedup import (
    CHIM_SPAN,
    CHIM_START,
    MIN_SPAN,
    SPAN_GRAM,
    SPAN_ID_SHIFT,
    dedup_span_exact,
    span_corpus,
)
from mongraph_spark.sparkutil import read_table

SF = "/root/testdata/sf0.001"


def test_span_dedup_finds_every_planted_span(spark):
    """Every chimera (id d+2M) copies tokens CHIM_START..CHIM_START+39 of
    doc p=d+1 verbatim; whenever p actually has >= CHIM_START+CHIM_SPAN-1
    tokens the detector MUST report the (p, chimera) pair with a span of
    >= CHIM_SPAN tokens — exact recall is the operator's whole claim."""
    docs = read_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
    )
    full_window = CHIM_START + CHIM_SPAN - 1
    expected = {
        (r.doc_id, r.doc_id - 1 + SPAN_ID_SHIFT)
        for r in docs.filter(F.col("n") >= full_window).collect()
        if r.doc_id >= 1  # needs a predecessor to be some chimera's partner
    }
    # drop partners whose predecessor doesn't exist in the table
    have = {r.doc_id for r in docs.collect()}
    expected = {(p, c) for (p, c) in expected if (c - SPAN_ID_SHIFT) in have}
    assert expected, "fixture should plant at least one full-window chimera"
    found = dedup_span_exact(spark, SF).collect()
    by_pair = {}
    for r in found:
        by_pair.setdefault((r.id_a, r.id_b), []).append(r)
    for p, c in expected:
        spans = by_pair.get((p, c)) or by_pair.get((c, p))
        assert spans, f"planted span (doc {p} -> chimera {c}) not found"
        assert max(s.span_tokens for s in spans) >= CHIM_SPAN


def test_span_dedup_geometry_and_maximality(spark):
    """Span arithmetic: every reported span satisfies the RLE identity
    (span >= MIN_SPAN, fits inside both docs at the reported offsets) and
    is verbatim-equal text in both documents — the exactness guarantee."""
    corpus = span_corpus(spark, SF).collect()
    toks = {r.doc_id: r.text.split(" ") for r in corpus}
    found = dedup_span_exact(spark, SF).collect()
    assert found
    for r in found:
        assert r.span_tokens >= MIN_SPAN >= SPAN_GRAM
        a, b = toks[r.id_a], toks[r.id_b]
        sa = a[r.start_a - 1 : r.start_a - 1 + r.span_tokens]
        sb = b[r.start_b - 1 : r.start_b - 1 + r.span_tokens]
        assert len(sa) == r.span_tokens and sa == sb  # verbatim duplicate
        # maximality: the span cannot extend by one token on either side
        left_ext = (
            r.start_a > 1
            and r.start_b > 1
            and a[r.start_a - 2] == b[r.start_b - 2]
        )
        right_ext = (
            r.start_a - 1 + r.span_tokens < len(a)
            and r.start_b - 1 + r.span_tokens < len(b)
            and a[r.start_a - 1 + r.span_tokens] == b[r.start_b - 1 + r.span_tokens]
        )
        assert not left_ext and not right_ext


def test_chimera_head_never_reported(spark):
    """The chimera head is CHIM_HEAD (< MIN_SPAN) tokens from its own base
    doc, so a chimera's only reportable partner is its window source —
    pairs (d, d+2M) must NOT appear (head too short to qualify)."""
    found = dedup_span_exact(spark, SF).collect()
    for r in found:
        if r.id_b >= SPAN_ID_SHIFT and r.id_a < SPAN_ID_SHIFT:
            assert r.id_a != r.id_b - SPAN_ID_SHIFT, (
                f"head-only pair reported: {r}"
            )


def test_dau_wau_hll_error_within_3sigma(spark):
    """The sliding-HLL estimates must sit within the 3-sigma HLL
    standard-error envelope for m=64 registers (3 x 1.04/sqrt(64) = 39%),
    for every day, at both test scales' regimes (linear-counting range
    here; the raw-estimate range is exercised at larger SF by the
    cross-scale gate)."""
    from mongraph_spark.queries.events import events_dau_wau_hll

    bound_bp = 3900
    rows = events_dau_wau_hll(spark, SF).collect()
    assert rows
    assert max(r.dau_err_bp for r in rows) <= bound_bp
    assert max(r.wau_err_bp for r in rows) <= bound_bp
    # the sketch is a union over exactly the exact twin's window: WAU est
    # can never legitimately fall below the same day's DAU est by more
    # than rounding (register-wise max is monotone under union)
    for r in rows:
        assert r.wau_est_x100 >= r.dau_est_x100


def test_span_trim_removes_planted_windows(spark):
    """After the trim pass, the planted window is actually gone: every
    trimmed chimera loses >= its detected span tokens, the rebuilt text
    is consistent (before - removed tokens), and the partner's copied
    window no longer appears verbatim in the trimmed text."""
    from mongraph_spark.queries.dedup import dedup_span_trim

    corpus = {r.doc_id: r.text.split(" ") for r in span_corpus(spark, SF).collect()}
    trimmed = dedup_span_trim(spark, SF).collect()
    assert trimmed
    for r in trimmed:
        kept = r.text_trimmed.split(" ") if r.text_trimmed else []
        assert len(kept) == r.n_tokens_before - r.n_tokens_removed
        assert r.n_tokens_removed >= MIN_SPAN
        if r.doc_id >= SPAN_ID_SHIFT:  # a chimera: its planted window must be cut
            partner = corpus.get(r.doc_id - SPAN_ID_SHIFT + 1)
            if partner and len(partner) >= CHIM_START + CHIM_SPAN - 1:
                window = " ".join(partner[CHIM_START - 1 : CHIM_START - 1 + CHIM_SPAN])
                assert window not in (r.text_trimmed or "")


def test_clustering_coefficient_invariants(spark):
    """Sum of per-node triangles = 3 x global triangle count (each
    triangle has 3 corners), cc_bp bounded by 10000, and the degree
    column matches an independent recount."""
    from mongraph_spark.queries.graph_analytics import (
        graph_clustering_coefficient,
        graph_triangle_count,
    )

    cc = graph_clustering_coefficient(spark, SF).collect()
    assert cc
    tri_row = graph_triangle_count(spark, SF).collect()[0]
    n_tri = tri_row.n_triangles if hasattr(tri_row, "n_triangles") else tri_row[0]
    assert sum(r.triangles for r in cc) == 3 * n_tri
    for r in cc:
        assert 0 <= r.cc_bp <= 10000
        assert r.degree >= 2
        # cc_bp is exactly the floored ratio
        assert r.cc_bp == (20000 * r.triangles) // (r.degree * (r.degree - 1))


def test_span_decontamination_matches_span_exact_cross_split(spark):
    """The decontamination report must be exactly dedup_span_exact's
    pair set restricted to cross-split pairs (train side x eval side),
    aggregated per eval doc — same machinery, same answer."""
    import hashlib

    from mongraph_spark.queries.dedup import (
        SPAN_TRAIN_PCT,
        corpus_span_decontamination,
        dedup_span_exact,
    )

    def split_of(doc_id: int) -> str:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < SPAN_TRAIN_PCT else "eval"

    spans = dedup_span_exact(spark, SF).collect()
    expected: dict[int, dict] = {}
    for r in spans:
        sa, sb = split_of(r.id_a), split_of(r.id_b)
        if sa == sb:
            continue
        train_id, eval_id = (r.id_a, r.id_b) if sa == "train" else (r.id_b, r.id_a)
        e = expected.setdefault(
            eval_id, {"train": set(), "n": 0, "mx": 0}
        )
        e["train"].add(train_id)
        e["n"] += 1
        e["mx"] = max(e["mx"], r.span_tokens)
    got = {r.eval_id: r for r in corpus_span_decontamination(spark, SF).collect()}
    assert set(got) == set(expected)
    assert expected, "fixture should plant at least one cross-split span"
    for eval_id, e in expected.items():
        g = got[eval_id]
        assert g.n_train_docs == len(e["train"])
        assert g.n_spans == e["n"]
        assert g.max_span_tokens == e["mx"]


def test_recall_curve_monotone_in_nprobe(spark):
    """Probe sets are nested, so recall@k is monotone non-decreasing in
    nprobe for every query; the largest probe count must reach at least
    the single-config report's recall."""
    from mongraph_spark.queries.similarity import (
        RECALL_CURVE_PROBES,
        ann_recall_curve,
        ann_recall_report,
    )

    curve = ann_recall_curve(spark, SF).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in curve:
        by_q.setdefault(r.q_id, {})[r.nprobe] = r.recall_bp
    assert by_q
    for q, pts in by_q.items():
        assert sorted(pts) == sorted(RECALL_CURVE_PROBES)
        seq = [pts[p] for p in sorted(pts)]
        assert seq == sorted(seq), f"recall not monotone for query {q}: {seq}"
    report = {r.q_id: r.recall_bp for r in ann_recall_report(spark, SF).collect()}
    for q, bp in report.items():
        assert by_q[q][2] == bp  # nprobe=2 point reproduces the report


def test_cusum_changepoint_matches_python_replay(spark):
    """Exact replay: daily counts -> integer S_k = n*P_k - k*T per type;
    the reported peak and day must equal the independent computation."""
    from collections import defaultdict

    from mongraph_spark.queries.events import events_cusum_changepoint

    ev = read_table(spark, SF, "events").select(
        "event_type", F.to_date("ts").alias("day")
    ).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.day] += 1
    got = {r.event_type: r for r in events_cusum_changepoint(spark, SF).collect()}
    assert set(got) == set(daily)
    for et, series in daily.items():
        days = sorted(series)
        n, t = len(days), sum(series.values())
        p = 0
        best = None
        for k, d in enumerate(days, start=1):
            p += series[d]
            s_abs = abs(n * p - k * t)
            if best is None or s_abs > best[0]:
                best = (s_abs, d)
        r = got[et]
        assert r.s_abs_max == best[0]
        assert r.cp_day == best[1].strftime("%Y-%m-%d")
        assert r.n_days == n and r.total_events == t
        assert r.peak_bp == (10000 * best[0]) // (n * t)


def test_harmonic_landmarks_consistent_with_closeness_state(spark):
    """Harmonic scores must be reconstructible from the shared landmark
    BFS state: for every reported node, h_micro equals the sum of
    1000000 // d over landmarks reaching it, landmarks never appear as
    targets, and ranks are the (score DESC, node_id ASC) order."""
    from mongraph_spark.queries.graph_analytics import (
        _landmark_state,
        graph_harmonic_landmarks,
    )

    state = _landmark_state(spark, SF).collect()
    lms = {r.node_id for r in state if r.dist == 0}
    per_node: dict[int, list[int]] = {}
    for r in state:
        if r.dist > 0 and r.node_id not in lms:
            per_node.setdefault(r.node_id, []).append(r.dist)
    got = graph_harmonic_landmarks(spark, SF).collect()
    assert got and len(got) <= 20
    expected_order = sorted(
        ((sum(1_000_000 // d for d in ds), -n) for n, ds in per_node.items()),
        reverse=True,
    )[: len(got)]
    for rk, r in enumerate(sorted(got, key=lambda r: r.rk), start=1):
        assert r.rk == rk
        assert r.node_id not in lms
        assert r.h_micro == sum(1_000_000 // d for d in per_node[r.node_id])
        assert r.n_landmarks_reaching == len(per_node[r.node_id])
        assert (r.h_micro, -r.node_id) == expected_order[rk - 1]


def test_source_matrix_conserves_pair_count(spark):
    """The matrix cells must sum to exactly the number of verified dup
    pairs, and every planted (base, base+1M) pair lands on the DIAGONAL
    (a copy inherits its base doc's source)."""
    from mongraph_spark.queries.dedup import dedup_ngram_jaccard, dedup_source_matrix

    pairs = dedup_ngram_jaccard(spark, SF).select("id_a", "id_b").collect()
    cells = dedup_source_matrix(spark, SF).collect()
    assert sum(c.n_pairs for c in cells) == len(pairs)
    planted = [p for p in pairs if p.id_b == p.id_a + 1_000_000]
    if planted:  # planted pairs resolve to the same base doc -> diagonal
        assert any(c.source_lo == c.source_hi for c in cells)
    for c in cells:
        assert c.source_lo <= c.source_hi and c.n_pairs > 0


def test_ab_cuped_invariants(spark):
    """CUPED must preserve the global mean EXACTLY (Σ(x−x̄) = 0 makes the
    adjustment sum-free even after θ quantization) and match an
    independent python replay of θ and ρ²."""
    import hashlib

    from mongraph_spark.queries.events import CUPED_PRE_DAYS, events_ab_cuped

    ev = read_table(spark, SF, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).collect()
    d0 = min(r.day for r in ev)
    xs, ys = {}, {}
    for r in ev:
        xs.setdefault(r.user_id, 0)
        ys.setdefault(r.user_id, 0)
        if (r.day - d0).days < CUPED_PRE_DAYS:
            xs[r.user_id] += 1
        elif r.event_type == "purchase":
            ys[r.user_id] += 1
    users = sorted(xs)
    n = len(users)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxx = sum(v * v for v in xs.values())
    sxy = sum(xs[u] * ys[u] for u in users)
    syy = sum(v * v for v in ys.values())
    covn, varxn, varyn = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    theta = (
        -((1_000_000 * -covn) // varxn) if covn < 0 else (1_000_000 * covn) // varxn
    )
    rho2 = (10_000 * covn * covn) // (varxn * varyn)
    rows = {r.arm: r for r in events_ab_cuped(spark, SF).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.theta_micro == theta
        assert r.rho2_bp == rho2
        assert 0 <= r.rho2_bp <= 10_000
    # arms partition users by the md5 bucket
    arm_of = lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
    for arm in (0, 1):
        members = [u for u in users if arm_of(u) == arm]
        assert rows[arm].n_users == len(members)
        assert rows[arm].sum_y == sum(ys[u] for u in members)
    # global-mean preservation: weighted mean of adjusted == mean of y,
    # exactly in the pre-floor arithmetic -> within 1 micro per arm after
    total_y_micro = (1_000_000 * sy) // n
    w_adj = sum(rows[a].mean_adj_micro * rows[a].n_users for a in (0, 1))
    assert abs(w_adj - total_y_micro * n) <= n + 2 * 1  # floor slack per arm


def test_store_history_conservation(spark):
    """Version-over-version accounting must balance: n_rows(v) =
    n_rows(v-1) + n_added(v) - n_removed(v), v0's added is its own row
    count, and exactly the last version is current."""
    from mongraph_spark.queries.quality import store_history

    rows = {r.version: r for r in store_history(spark, SF).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n_added == rows[0].n_rows and rows[0].n_removed == 0
    for v in (1, 2):
        assert (
            rows[v].n_rows
            == rows[v - 1].n_rows + rows[v].n_added - rows[v].n_removed
        )
    assert [rows[v].is_current for v in (0, 1, 2)] == [0, 0, 1]


def test_threshold_curve_monotone(spark):
    """Pair yield, truth size, and hits are monotone non-increasing in
    the threshold (filters are nested), and the 8000 bp point reproduces
    dedup_ngram_jaccard's pair count."""
    from mongraph_spark.queries.dedup import (
        DEDUP_THRESHOLDS_BP,
        dedup_ngram_jaccard,
        dedup_threshold_curve,
    )

    rows = {r.threshold_bp: r for r in dedup_threshold_curve(spark, SF).collect()}
    assert sorted(rows) == sorted(DEDUP_THRESHOLDS_BP)
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[a].n_pairs >= rows[b].n_pairs
        assert rows[a].n_truth >= rows[b].n_truth
        assert rows[a].n_hit >= rows[b].n_hit
    for r in rows.values():
        assert r.n_hit <= min(r.n_pairs, r.n_truth)
    assert rows[8000].n_pairs == dedup_ngram_jaccard(spark, SF).count()
