"""Round-9 fourth sweep: Kruskal-Wallis / McNemar / Cramér's V stats ops.

Reference parity: the reference exposes no analytics surface
(src/mongraph.coffee:9-48 is Mongoose↔Neo4j glue); these extend the §2.7
stats battery with crafted-fixture python replays of the exact integer
layers and the fixed IEEE finisher trees.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _orders_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _write_orders(spark, tmp_path, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_kruskal_wallis_python_replay(spark, tmp_path):
    """Three crafted priority groups with a known rank layout (including a
    cross-group tie); python replays the doubled-rank sums, tie term, and
    the shared IEEE H' tree bit-for-bit."""
    from mongraph_spark.queries.relational import KW_GROUPS, stats_kruskal_wallis

    g1, g2, g3 = KW_GROUPS
    prices = {
        g1: [1.0, 2.0, 3.0],
        g2: [2.0, 5.0, 6.0],   # 2.0 ties across g1/g2
        g3: [7.0, 8.0, 9.0],
    }
    rows = []
    k = 0
    for grp, vals in prices.items():
        for v in vals:
            rows.append((k, grp, v))
            k += 1
    # an excluded priority must not enter the ranking
    rows.append((k, "5-LOW", 100.0))
    _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    got = stats_kruskal_wallis(spark, str(tmp_path)).collect()[0]
    assert (got.n1, got.n2, got.n3) == (3, 3, 3)

    # python replay: doubled tie-averaged ranks over the 9 cents values
    allv = sorted(round(v * 100) for vals in prices.values() for v in vals)
    def r2(c):
        rmin = 1 + sum(1 for x in allv if x < c)
        tie = sum(1 for x in allv if x == c)
        return 2 * rmin + tie - 1
    rsums = {g: sum(r2(round(v * 100)) for v in vs) for g, vs in prices.items()}
    tie_term = sum(
        t**3 - t
        for t in __import__("collections").Counter(allv).values()
    )
    assert got.tie_term == tie_term == (2**3 - 2)
    n1 = n2 = n3 = 3.0
    n_all = 9.0
    s = (
        (float(rsums[g1]) * float(rsums[g1]) / n1)
        + (float(rsums[g2]) * float(rsums[g2]) / n2)
        + (float(rsums[g3]) * float(rsums[g3]) / n3)
    )
    h = 3.0 * s / (n_all * (n_all + 1.0)) - 3.0 * (n_all + 1.0)
    hp = h / (1.0 - float(tie_term) / (n_all**3 - n_all))
    assert got.kw_h_ppm == math.floor(1000000.0 * hp)
    assert got.significant_95 == (1 if got.kw_h_ppm >= 5991465 else 0)
    # the fixture separates the groups strongly: H' must clear the bar
    assert got.significant_95 == 1


def test_mcnemar_exact_counts(spark, tmp_path):
    """Hand-built paired design: 3 customers active only in year A, 1 only
    in B, 2 in both — b=3, c=1, chi2 = (3-1)^2/(3+1) = 1.0 exactly."""
    from mongraph_spark.queries.relational import (
        MCNEMAR_YEAR_A,
        MCNEMAR_YEAR_B,
        stats_mcnemar,
    )

    import datetime

    da = datetime.datetime(MCNEMAR_YEAR_A, 6, 1)
    db = datetime.datetime(MCNEMAR_YEAR_B, 6, 1)
    other = datetime.datetime(1999, 6, 1)
    rows = []
    ok = 0
    for cust in (1, 2, 3):          # active in A only
        rows.append((ok, cust, da)); ok += 1
    rows.append((ok, 4, db)); ok += 1   # active in B only
    for cust in (5, 6):             # both years (two orders each)
        rows.append((ok, cust, da)); ok += 1
        rows.append((ok, cust, db)); ok += 1
    rows.append((ok, 7, other))     # outside either year: not a pair
    _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = stats_mcnemar(spark, str(tmp_path)).collect()[0]
    assert got.n_pairs == 6          # customer 7 never enters
    assert got.concordant_both == 2
    assert (got.only_a, got.only_b) == (3, 1)
    assert got.chi2_bp == 10000 * (3 - 1) ** 2 // 4  # = 10000
    assert got.significant_95 == 0


def test_cramers_v_perfect_and_null_association(spark, tmp_path):
    """Perfect association (status determined by priority) drives V to 1;
    an independent table drives it to 0 — the two ends of the scale."""
    from mongraph_spark.queries.relational import stats_cramers_v

    # perfect: 2x2, each status pairs with exactly one priority
    rows = []
    k = 0
    for _ in range(5):
        rows.append((k, "F", "1-URGENT")); k += 1
        rows.append((k, "O", "5-LOW")); k += 1
    _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_orderstatus string, o_orderpriority string",
    )
    got = stats_cramers_v(spark, str(tmp_path)).collect()[0]
    assert got.min_dim if hasattr(got, "min_dim") else True
    assert got.dof_min == 1
    assert got.n == 10
    # per-cell e8 floors lose <4e-8 total: V_ppm = 999999 or 1000000
    assert got.cramers_v_ppm in (999999, 1000000)

    # independence: every (status, priority) cell equal
    rows = []
    k = 0
    for s in ("F", "O"):
        for p in ("1-URGENT", "5-LOW"):
            for _ in range(3):
                rows.append((k, s, p)); k += 1
    _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_orderstatus string, o_orderpriority string",
    )
    got = stats_cramers_v(spark, str(tmp_path)).collect()[0]
    assert got.chi2_e8 == 0 and got.cramers_v_ppm == 0


def _events_parquet(spark, tmp_path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_autocorrelation_python_replay(spark, tmp_path):
    """Alternating hourly series: ACF(1) strongly negative, ACF(2)
    strongly positive; python replays the exact n²-cleared rationals."""
    from mongraph_spark.queries.events import events_autocorrelation

    vals = [10.0, 50.0] * 6  # 12 hours, alternating
    rows = [
        (i, f"2024-01-01 {i:02d}:30:00", 1, "click", v)
        for i, v in enumerate(vals)
    ]
    _events_parquet(spark, tmp_path, rows)
    got = {
        (r.lag): r
        for r in events_autocorrelation(spark, str(tmp_path)).collect()
    }
    y = [round(v * 100) for v in vals]
    n, s = len(y), sum(y)
    dev = [n * v - s for v in y]
    den = sum(d * d for d in dev)
    for lag in (1, 2, 3, 6):
        num = sum(dev[t] * dev[t + lag] for t in range(n - lag))
        expect = (
            (1000000 * num) // den
            if num >= 0
            else -((1000000 * (-num)) // den)
        )
        assert got[lag].acf_ppm == expect, lag
        assert got[lag].n_pairs == n - lag
    assert got[1].acf_ppm < -800000 and got[2].acf_ppm > 800000


def test_page_hinkley_detects_upward_shift(spark, tmp_path):
    """Flat series then a sustained jump: the PH score peaks at the end,
    the drift score clears the alarm bar, and a no-drift control stays
    quiet.  Python replays the ppm-grid incremental-mean scan exactly."""
    from mongraph_spark.queries.events import (
        PH_ALARM_PPM,
        events_page_hinkley,
    )

    flat = [20.0] * 12
    drift = [20.0] * 6 + [80.0] * 6
    rows = [
        (i, f"2024-01-01 {i:02d}:15:00", 1, "steady", v)
        for i, v in enumerate(flat)
    ] + [
        (100 + i, f"2024-01-01 {i:02d}:15:00", 1, "shifted", v)
        for i, v in enumerate(drift)
    ]
    _events_parquet(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_page_hinkley(spark, str(tmp_path)).collect()}

    def replay(vals):
        y = [round(v * 100) for v in vals]
        s = u = 0
        us = []
        for t, v in enumerate(y, 1):
            s += v
            mean_ppm = (1000000 * s) // t if s >= 0 else -((1000000 * -s) // t)
            u += 1000000 * v - mean_ppm
            us.append(u)
        run, ph_seq = None, []
        for uu in us:
            run = uu if run is None else min(run, uu)
            ph_seq.append(uu - run)
        ph_max = max(ph_seq)
        argmax = 1 + ph_seq.index(ph_max)  # first t attaining the max
        score = (1000000 * ph_max) // (1000000 * sum(y))
        return ph_max, argmax, score

    ph_max, argmax, score = replay(drift)
    r = got["shifted"]
    assert r.ph_max_cents == ph_max // 1000000
    assert r.ph_argmax_t == argmax == 12
    assert r.drift_score_ppm == score
    assert r.alarmed == 1 and score >= PH_ALARM_PPM

    r0 = got["steady"]
    assert r0.ph_max_cents == 0 and r0.alarmed == 0


def test_streaming_page_hinkley_batch_equal(spark):
    """The twin's watermarked rollup state reproduces the batch detector
    row-for-row at sf0.001."""
    from mongraph_spark.queries.events import events_page_hinkley
    from mongraph_spark.streaming.events import streaming_page_hinkley

    sf = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, events_page_hinkley(spark, sf).collect()))
    stream = sorted(map(tuple, streaming_page_hinkley(spark, sf).collect()))
    assert batch == stream


def test_cochran_q_python_replay(spark, tmp_path):
    """Crafted 3-year design; python replays the integer Q exactly."""
    import datetime

    from mongraph_spark.queries.relational import COCHRAN_YEARS, stats_cochran_q

    y1, y2, y3 = COCHRAN_YEARS
    # per-customer activity patterns across the three years
    patterns = [
        (1, 1, 1),  # always active (no signal)
        (1, 0, 0),
        (1, 1, 0),
        (1, 0, 0),
        (0, 1, 0),
        (1, 1, 0),
    ]
    rows, ok = [], 0
    for cust, pat in enumerate(patterns, 1):
        for y, active in zip((y1, y2, y3), pat):
            if active:
                rows.append((ok, cust, datetime.datetime(y, 5, 1)))
                ok += 1
    _write_orders(
        spark, tmp_path, rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = stats_cochran_q(spark, str(tmp_path)).collect()[0]
    k = 3
    g = [sum(p[j] for p in patterns) for j in range(k)]
    ls = [sum(p) for p in patterns]
    n = sum(ls)
    dev = sum((k * gj - n) ** 2 for gj in g)
    q_bp = (10000 * (k - 1) * dev) // (k * (k * n - sum(l * l for l in ls)))
    assert (got.g1, got.g2, got.g3) == tuple(g)
    assert got.n_subjects == len(patterns)
    assert got.q_bp == q_bp
    assert got.significant_95 == (1 if q_bp >= 59915 else 0)


def test_hampel_flags_spike_not_step(spark, tmp_path):
    """A lone spike is flagged; a legitimate level shift is NOT (the
    rolling median follows the step) — the property that distinguishes
    Hampel from a z-score window."""
    from mongraph_spark.queries.events import events_hampel_filter

    spike = [20.0] * 6 + [500.0] + [20.0] * 5          # one outlier
    step = [20.0] * 6 + [60.0] * 6                      # regime change
    rows = [
        (i, f"2024-01-01 {i:02d}:05:00", 1, "spiky", v)
        for i, v in enumerate(spike)
    ] + [
        (100 + i, f"2024-01-01 {i:02d}:05:00", 1, "steppy", v)
        for i, v in enumerate(step)
    ]
    _events_parquet(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_hampel_filter(spark, str(tmp_path)).collect()}
    assert got["spiky"].n_outliers == 1
    assert got["spiky"].outlier_t_sum == 7  # the spike's 1-based index
    assert got["spiky"].max_outlier_dev_cents == (50000 - 2000)
    assert got["steppy"].n_outliers == 0


def test_streaming_acf_batch_equal(spark):
    from mongraph_spark.queries.events import events_autocorrelation
    from mongraph_spark.streaming.events import streaming_autocorrelation

    sf = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, events_autocorrelation(spark, sf).collect()))
    stream = sorted(map(tuple, streaming_autocorrelation(spark, sf).collect()))
    assert batch == stream


def test_croston_python_replay(spark, tmp_path):
    """Crafted intermittent series (demand on days 2, 5, 6 of 8); python
    replays the integer z/p recursion exactly, including the first-demand
    init and the interval reset."""
    from mongraph_spark.queries.events import CROSTON_THRESHOLD, events_croston

    hi = CROSTON_THRESHOLD + 50.0   # a demand day
    lo = 10.0                        # below threshold: d = 0
    series = [lo, hi, lo, lo, hi, hi, lo, lo]
    rows = [
        (i, f"2024-01-{i+1:02d} 10:00:00", 1, "spare", v)
        for i, v in enumerate(series)
    ]
    _events_parquet(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_croston(spark, str(tmp_path)).collect()}
    r = got["spare"]

    z = p = q = 0
    seen = False
    demands = 0
    for v in series:
        d = round(v * 100) if v >= CROSTON_THRESHOLD else 0
        if d > 0:
            demands += 1
            if seen:
                z = (z + d) // 2
                p = (p + q + 1) // 2
            else:
                z, p, seen = d, q + 1, True
            q = 0
        else:
            q += 1
    assert r.n_days == len(series) and r.n_demand_days == demands == 3
    assert (r.z_cents, r.p_periods) == (z, p)
    assert r.forecast_microcents == (1000000 * z) // p
    # zero-demand series: all smoother outputs NULL
    rows2 = [(i, f"2024-01-{i+1:02d} 10:00:00", 1, "quiet", lo) for i in range(4)]
    _events_parquet(spark, tmp_path, rows + rows2)
    got = {r.event_type: r for r in events_croston(spark, str(tmp_path)).collect()}
    assert got["quiet"].z_cents is None
    assert got["quiet"].forecast_microcents is None


def test_feature_lags_edges_and_delta(spark, tmp_path):
    from mongraph_spark.queries.relational import window_feature_lags

    vals = [10.0, 20.0, 5.0]
    rows = [
        (i, f"2024-01-{i+1:02d} 09:00:00", 1, "m", v) for i, v in enumerate(vals)
    ]
    _events_parquet(spark, tmp_path, rows)
    got = sorted(
        window_feature_lags(spark, str(tmp_path)).collect(), key=lambda r: r.day
    )
    assert got[0].lag_1d is None and got[0].delta_bp is None
    assert got[0].lead_1d == 2000
    assert got[1].delta_bp == (10000 * (2000 - 1000)) // 1000  # +100%
    assert got[2].delta_bp == -((10000 * (2000 - 500)) // 2000)  # -75%
    assert got[2].roll7_sum == 3500 and got[2].roll7_min == 500
    assert got[2].lead_1d is None


def test_streaming_hampel_and_croston_batch_equal(spark):
    from mongraph_spark.queries.events import (
        events_croston,
        events_hampel_filter,
    )
    from mongraph_spark.streaming.events import (
        streaming_croston,
        streaming_hampel_filter,
    )

    sf = "/root/testdata/sf0.001"
    for batch_fn, stream_fn in (
        (events_hampel_filter, streaming_hampel_filter),
        (events_croston, streaming_croston),
    ):
        batch = sorted(map(tuple, batch_fn(spark, sf).collect()))
        stream = sorted(map(tuple, stream_fn(spark, sf).collect()))
        assert batch == stream, batch_fn.__name__


def test_rake_keywords_crafted_corpus(spark, tmp_path):
    """Two-doc corpus with known phrase structure; python replays the
    deg/freq ppm grid and the phrase ranking."""
    from mongraph_spark.queries.text import STOPWORDS, text_rake_keywords

    assert "the" in STOPWORDS and "of" in STOPWORDS
    texts = [
        "spark shuffle the spark shuffle of merge",
        "merge the spark shuffle",
    ]
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = text_rake_keywords(spark, str(tmp_path)).collect()

    # phrases: doc0 -> ["spark shuffle", "spark shuffle", "merge"],
    # doc1 -> ["merge", "spark shuffle"]
    # freq: spark=3 shuffle=3 merge=2 ; deg: spark=6 shuffle=6 merge=2
    ws = {"spark": (1000000 * 6) // 3, "shuffle": (1000000 * 6) // 3, "merge": (1000000 * 2) // 2}
    expect = {
        "spark shuffle": (ws["spark"] + ws["shuffle"], 3),
        "merge": (ws["merge"], 2),
    }
    by_phrase = {r.phrase: (r.score_ppm, r.n_occurrences) for r in got}
    assert by_phrase == expect
    assert got[0].phrase == "spark shuffle"  # top by score


def test_stratified_kfold_balance_and_determinism(spark):
    """Per-stratum fold sizes differ by at most 1 (round-robin over a
    total order) and the assignment is bit-reproducible."""
    from mongraph_spark.queries.pipeline import KFOLD_K, pipeline_stratified_kfold

    sf = "/root/testdata/sf0.001"
    a = pipeline_stratified_kfold(spark, sf).collect()
    b = pipeline_stratified_kfold(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_stratum = {}
    for r in a:
        per_stratum.setdefault((r.lang, r.source), []).append(r.n_docs)
    for (lang, source), counts in per_stratum.items():
        assert len(counts) <= KFOLD_K
        assert max(counts) - min(counts) <= 1, (lang, source, counts)
        total = sum(counts)
        for r in a:
            if (r.lang, r.source) == (lang, source):
                assert r.stratum_total == total


def test_eigenvector_centrality_shape(spark):
    """Grid invariants on the real sf0.001 graph: scores live on [0, G],
    the global max is exactly G (the renormalization target), hub
    collections (region/nation) dominate leaf collections, and the
    iteration is deterministic."""
    from mongraph_spark.queries.graph_analytics import (
        EIG_GRID,
        graph_eigenvector_centrality,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r.coll_code: r for r in graph_eigenvector_centrality(spark, sf).collect()}
    assert max(r.max_score for r in rows.values()) == EIG_GRID
    for r in rows.values():
        assert 0 <= r.min_score <= r.max_score <= EIG_GRID
    # region(1)/nation(2) are the symmetrized hubs; parts(5) are leaves
    assert rows[2].max_score > rows[5].max_score
    again = {r.coll_code: r for r in graph_eigenvector_centrality(spark, sf).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_new_stats_plans_stay_partitioned(spark):
    """No Python eval anywhere in the fourth/fifth-sweep plans, and the
    per-series/stratum windows shuffle on their keys — no Exchange
    SinglePartition beyond the documented bounded finishers (plan-level
    scale pin)."""
    from mongraph_spark.queries.events import (
        events_autocorrelation,
        events_hampel_filter,
        events_page_hinkley,
    )
    from mongraph_spark.queries.pipeline import pipeline_stratified_kfold
    from mongraph_spark.queries.relational import (
        stats_cochran_q,
        stats_cramers_v,
        stats_mcnemar,
    )
    from mongraph_spark.queries.text import text_rake_keywords

    sf = "/root/testdata/sf0.001"
    for fn in (
        stats_mcnemar,
        stats_cramers_v,
        stats_cochran_q,
        events_autocorrelation,
        events_page_hinkley,
        events_hampel_filter,
        pipeline_stratified_kfold,
        text_rake_keywords,
    ):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, fn.__name__
    # the per-series ops must not collapse to one partition
    for fn in (events_hampel_filter, pipeline_stratified_kfold):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, fn.__name__
