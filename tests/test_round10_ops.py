"""Round-10 analytics sweep: Mann-Kendall, Friedman, Cohen's kappa,
STL-lite decomposition, TextRank keywords, SCD2 assembly — known-value
and edge-case pins complementing the oracle gate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M


def _hours(vals, typ="a"):
    t0 = datetime.datetime(2024, 1, 1)
    return [
        (typ, t0 + datetime.timedelta(hours=i), v) for i, v in enumerate(vals)
    ]


def test_mann_kendall_known_values(spark):
    from mongraph_spark.queries.events import mann_kendall_finish

    # strictly increasing: S = C(5,2) = 10, no ties
    hourly = spark.createDataFrame(
        _hours([1, 2, 3, 4, 5]), "event_type string, hour timestamp, y long"
    )
    r = mann_kendall_finish(hourly).collect()[0]
    assert r["s_stat"] == 10 and r["n_hours"] == 5
    assert r["var18"] == 5 * 4 * 15  # no tie term
    # constant series: S = 0, var18 = 0 (fully tied), z = 0, no trend
    flat = spark.createDataFrame(
        _hours([7, 7, 7, 7]), "event_type string, hour timestamp, y long"
    )
    r = mann_kendall_finish(flat).collect()[0]
    assert r["s_stat"] == 0 and r["var18"] == 0
    assert r["z"] == 0.0 and r["trend"] == "none"


def test_mann_kendall_decreasing_flags(spark):
    from mongraph_spark.queries.events import mann_kendall_finish

    hourly = spark.createDataFrame(
        _hours(list(range(30, 0, -1))), "event_type string, hour timestamp, y long"
    )
    r = mann_kendall_finish(hourly).collect()[0]
    assert r["s_stat"] == -(30 * 29 // 2)
    assert r["trend"] == "decreasing" and r["z"] < -1.96


def test_friedman_identical_treatments_is_null(spark, sf001_dir=None):
    # build a tiny grid by hand through the same finisher arithmetic:
    # every block fully tied -> denominator 0 -> NULL statistic; checked
    # end-to-end via the public query against a degenerate frame is not
    # possible (it reads the events table), so pin the algebra instead:
    # k=3, n=2 blocks with distinct values -> known Q
    # ranks per block: 2r = [2,4,6]; D_j = [4,8,12]
    # num = (k-1)(sum Dj^2 - n^2 k (k+1)^2) = 2*(224 - 4*3*16) = 2*32 = 64
    # den = sum(2r)^2 - n k (k+1)^2 = 2*(4+16+36) - 2*3*16 = 112 - 96 = 16
    # Q = 64/16 = 4.0 -> 4_000_000 ppm
    num = 2 * ((16 + 64 + 144) - 4 * 3 * 16)
    den = 2 * (4 + 16 + 36) - 2 * 3 * 16
    assert (1_000_000 * num) // den == 4_000_000


def test_cohens_kappa_perfect_and_independent(spark):
    # perfect agreement: kappa = 1
    n, n11, n00, n10, n01 = 10, 4, 6, 0, 0
    S = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert (1_000_000 * (n * (n11 + n00) - S)) // (n * n - S) == 1_000_000
    # statistical independence: kappa = 0 (2x2 with independent margins)
    n, n11, n10, n01, n00 = 100, 6, 14, 24, 56  # margins 20/80 x 30/70
    S = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert n * (n11 + n00) - S == 0


def test_stl_constant_series_zero_seasonal(spark):
    from mongraph_spark.queries.events import stl_finish

    hourly = spark.createDataFrame(
        _hours([50] * 48), "event_type string, hour timestamp, y long"
    )
    rows = stl_finish(hourly).collect()
    assert len(rows) == 24
    assert all(r["seasonal_ppm"] == 0 for r in rows)  # trend == y everywhere


def test_stl_periodic_series_recovers_sign(spark):
    from mongraph_spark.queries.events import stl_finish

    # 24h square wave: hours 0-11 low, 12-23 high, over 4 days
    vals = ([10] * 12 + [90] * 12) * 4
    hourly = spark.createDataFrame(
        _hours(vals), "event_type string, hour timestamp, y long"
    )
    seas = {r["hour_of_day"]: r["seasonal_ppm"] for r in stl_finish(hourly).collect()}
    assert all(seas[h] < 0 for h in range(3, 9))  # low phase well inside
    assert all(seas[h] > 0 for h in range(15, 21))  # high phase well inside


def test_scd2_reinsert_after_delete(spark, tmp_path):
    root = str(tmp_path / "tbl")
    M.init_table(
        spark.createDataFrame([(1, "a")], "k long, v string"), root,
        key="k", n_buckets=2,
    )
    M.delete_where(spark, root, F.col("k") == 1)  # v1
    M.upsert(
        spark, root,
        spark.createDataFrame([(1, "b")], "k long, v string"), key="k",
    )  # v2: rebirth
    rows = sorted(
        M.scd2_history(spark, root).collect(), key=lambda r: r["_valid_from"]
    )
    assert [(r["_valid_from"], r["_valid_to"], r["_is_current"], r["v"]) for r in rows] == [
        (0, 1, False, "a"),
        (2, None, True, "b"),
    ]


def test_textrank_hub_word_wins(spark, monkeypatch):
    from mongraph_spark.queries import text as T

    # 'alpha' co-occurs with every other content word -> highest centrality
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo alpha candy alpha delta"),
            (2, "alpha echos alpha fancy"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(
        T, "read_table", lambda s, d, n: docs
    )
    out = T.text_textrank_keywords(spark, "ignored").collect()
    assert out[0]["word"] == "alpha"
    assert out[0]["score"] == 1000  # grid max


def test_jonckheere_known_direction():
    # three ordered groups g1={1,2}, g2={3,4}, g3={5,6}: every cross pair
    # strictly increasing -> U12=U13=U23=4, J=12, 2J=24
    # N=6, mean4 = 36 - 12 = 24 -> 4E = 24, 2*(2J) = 48 > 24 -> increasing
    n = [2, 2, 2]
    N = sum(n)
    j2 = 24
    mean4 = N * N - sum(x * x for x in n)
    assert 2 * j2 > mean4
    var72 = N * N * (2 * N + 3) - sum(x * x * (2 * x + 3) for x in n)
    z = (2 * j2 - mean4) / ((var72 * 16.0 / 72.0) ** 0.5)
    assert z > 2.0  # perfectly ordered sample is deep in the tail


def test_conformal_perfect_seasonal_has_zero_qhat(spark):
    from mongraph_spark.queries.events import conformal_finish

    # exact weekly-periodic daily series: every lag-7 residual is 0, so
    # qhat = 0 and held-out coverage is 100%
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + datetime.timedelta(days=i), (i % 7) * 10 + 5)
        for i in range(35)
    ]
    daily = spark.createDataFrame(rows, "event_type string, day timestamp, y long")
    r = conformal_finish(daily).collect()[0]
    assert r["qhat_cents"] == 0 and r["coverage_ppm"] == 1_000_000


def test_runs_test_moments_algebra():
    # alternating series: n1 = n0 = 10, R = 20 (maximum) -> z > 0 and large
    n1 = n0 = 10
    n = n1 + n0
    R = 20
    mu_num = n + 2 * n1 * n0  # mu * n
    z_num = (R * n - mu_num) / n
    var = (2 * n1 * n0 * (2 * n1 * n0 - n)) / (n * n * (n - 1))
    z = z_num / var**0.5
    assert z > 3.5  # perfectly alternating is deep in the too-many-runs tail
