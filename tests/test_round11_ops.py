"""Known-value pins for the round-11 operators: Granger causality,
Kendall τ-b, the SRP knob sheets' monotonicity, and the eigenvector
attractor stop."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _hourly(spark, rows):
    # rows: (event_type, hour_index, y) -> the (event_type, hour, y) shape
    return spark.createDataFrame(
        [(t, f"2024-01-01 {h:02d}:00:00", y) for t, h, y in rows],
        "event_type string, hour string, y long",
    ).select("event_type", F.col("hour").cast("timestamp").alias("hour"), "y")


def test_granger_perfect_lag_predictor(spark):
    # y_t = x_{t-1} exactly; y's own lag is useless -> huge F, tiny RSS ratio
    from mongraph_spark.queries.inference import granger_finish

    xs = [7, 1, 9, 2, 8, 3, 6, 4, 5, 10, 2, 9]
    rows = [("a", h, x * 1000) for h, x in enumerate(xs)]
    rows += [("b", h + 1, x) for h, x in enumerate(xs[:-1])]
    out = granger_finish(_hourly(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["type_a"] == "a" and r["type_b"] == "b"
    # unrestricted model is (numerically) exact: RSS_u ~ 0 -> F explodes
    assert r["f_ppm"] is None or r["f_ppm"] > 100 * 1_000_000
    if r["rss_ratio_ppm"] is not None:
        assert r["rss_ratio_ppm"] < 10_000  # < 1% residual left


def test_granger_degenerate_guard(spark):
    # constant series -> C11 = 0 -> NULLs, no division error
    from mongraph_spark.queries.inference import granger_finish

    rows = [("a", h, 5) for h in range(8)] + [("b", h, 5) for h in range(8)]
    out = granger_finish(_hourly(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["f_ppm"] is None and out[0]["rss_ratio_ppm"] is None


def test_kendall_tau_perfect_and_reversed(spark):
    from mongraph_spark.queries.inference import kendall_finish

    # type 'a' must out-earn 'b' so (x, y) = (a, b); y = x -> tau = 1
    rows = [("a", h, (h + 1) * 100) for h in range(6)]
    rows += [("b", h, h + 1) for h in range(6)]
    out = kendall_finish(_hourly(spark, rows)).collect()[0]
    assert out["nc"] == 15 and out["nd"] == 0
    # sqrt(15)*sqrt(15) lands one ulp above 15 -> floor gives 999999
    assert out["tau_b_ppm"] in (999_999, 1_000_000)
    # reversed y -> tau = -1
    rows = [("a", h, (h + 1) * 100) for h in range(6)]
    rows += [("b", h, 100 - h) for h in range(6)]
    out = kendall_finish(_hourly(spark, rows)).collect()[0]
    assert out["nc"] == 0 and out["nd"] == 15
    assert out["tau_b_ppm"] == -1_000_000


def test_kendall_tau_ties(spark):
    from mongraph_spark.queries.inference import kendall_finish

    # x has one tied pair (hours 0,1), y distinct there -> t_x = 1
    rows = [("a", 0, 500), ("a", 1, 500), ("a", 2, 900)]
    rows += [("b", 0, 1), ("b", 1, 2), ("b", 2, 3)]
    out = kendall_finish(_hourly(spark, rows)).collect()[0]
    assert out["tx"] == 1 and out["ty"] == 0 and out["txy"] == 0
    assert out["nc"] == 2 and out["nd"] == 0
    # tau_b = 2 / (sqrt(3) * sqrt(2)) -> floor(1e6 * 0.81649...)
    assert out["tau_b_ppm"] == 816_496


def test_dickey_fuller_random_walk_vs_mean_reverting(spark):
    from mongraph_spark.queries.inference import dickey_fuller_finish

    # 'rw': a pure random walk (beta ~ 0, |t| small);
    # 'mr': alternating series (strongly mean-reverting: beta ~ -2)
    walk = [0, 3, 5, 4, 8, 11, 9, 13, 12, 16, 20, 18, 23, 25, 24, 28]
    rows = [("rw", h, v * 100) for h, v in enumerate(walk)]
    # noisy alternation (an exact ±c alternation fits perfectly -> RSS=0
    # -> the degenerate guard NULLs the t-stat by design)
    mr = [980, -1030, 1010, -990, 1040, -1005, 965, -1020,
          995, -1015, 1025, -985, 1000, -1010, 990, -1035]
    rows += [("mr", h, v) for h, v in enumerate(mr)]
    out = {
        r["event_type"]: r
        for r in dickey_fuller_finish(_hourly(spark, rows)).collect()
    }
    assert out["mr"]["beta_ppm"] < -1_800_000  # strong mean reversion
    assert out["rw"]["beta_ppm"] > -600_000  # nowhere near -1
    # mean-reverting t-stat is far more negative than the walk's
    assert out["mr"]["df_t_ppm"] < out["rw"]["df_t_ppm"]


def test_dickey_fuller_constant_series_guard(spark):
    from mongraph_spark.queries.inference import dickey_fuller_finish

    rows = [("c", h, 7) for h in range(10)]
    out = dickey_fuller_finish(_hourly(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["beta_ppm"] is None and out[0]["df_t_ppm"] is None


def test_srp_band_curve_monotone(spark):
    from mongraph_spark.queries.inference import ann_srp_band_curve

    rows = {r["bands"]: r for r in ann_srp_band_curve(spark, SF).collect()}
    assert sorted(rows) == [1, 2, 4, 8]
    for a, b in [(1, 2), (2, 4), (4, 8)]:
        assert rows[a]["n_candidates"] <= rows[b]["n_candidates"]
        assert rows[a]["n_found"] <= rows[b]["n_found"]


def test_srp_multiprobe_superset(spark):
    from mongraph_spark.queries.inference import ann_srp_multiprobe

    rows = {r["hamming_radius"]: r for r in ann_srp_multiprobe(spark, SF).collect()}
    assert sorted(rows) == [0, 1]
    assert rows[0]["n_candidates"] <= rows[1]["n_candidates"]
    assert rows[0]["n_found"] <= rows[1]["n_found"]
    assert rows[1]["recall_vs_r1_bp"] in (None, 10_000)


def test_eigenvector_converged_reports_stop_round(spark):
    from mongraph_spark.queries.graph_analytics import (
        EIG_CONV_MAX_ITER,
        EIG_TOPK,
        graph_eigenvector_converged,
    )

    out = graph_eigenvector_converged(spark, SF).collect()
    assert len(out) == EIG_TOPK
    rounds = {r["rounds_run"] for r in out}
    assert len(rounds) == 1
    (rr,) = rounds
    assert 1 <= rr <= EIG_CONV_MAX_ITER
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, EIG_TOPK + 1))
