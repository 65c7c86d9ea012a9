"""Convergence-stop variants of the iterative graph algorithms: the loop must
terminate on a data-driven condition (not a fixed unroll), keep lineage
bounded via per-round localCheckpoint, and land on the same fixed point the
oracle-checked unrolled versions compute."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongraph_spark.queries.graph_analytics import (
    connected_components_until_convergence,
    graph_connected_components,
    pagerank_until_convergence,
)

SF = "/root/testdata/sf0.001"


def test_cc_converges_and_matches_unrolled_fixed_point(spark):
    labels, rounds = connected_components_until_convergence(spark, SF, max_rounds=50)
    # stopped on the no-change condition, not the safety cap
    assert rounds < 50
    converged = {
        (r.component, r.n_nodes)
        for r in labels.groupBy(F.col("label").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .collect()
    }
    unrolled = {
        (r.component, r.n_nodes) for r in graph_connected_components(spark, SF).collect()
    }
    assert converged == unrolled


def test_pagerank_converges_below_cap(spark):
    ranks, iters = pagerank_until_convergence(spark, SF, tol_bp=50.0, max_iter=80)
    assert iters < 80
    # one more hand-rolled check: rank mass is conserved-ish — every rank is
    # >= (1 - damping) and the node count matches the graph
    row = ranks.agg(
        F.count(F.lit(1)).alias("n"), F.min("rank").alias("mn")
    ).first()
    assert row["n"] > 0
    assert row["mn"] >= 0.15 - 1e-9


def test_iterative_loops_have_bounded_lineage(spark):
    """After N data-dependent rounds the returned plan must NOT contain the
    N-deep join chain — localCheckpoint cuts it to a scan each round, which
    is what keeps a 100-iteration run planable at scale."""
    labels, rounds = connected_components_until_convergence(spark, SF, max_rounds=50)
    assert rounds >= 2
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan

    ranks, iters = pagerank_until_convergence(spark, SF, tol_bp=200.0, max_iter=30)
    assert iters >= 2
    plan = ranks._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan


def test_pagerank_converged_probe_deltas_far_from_tol():
    """ADVICE r6: the convergence-replay oracle compares float max|Δrank| to
    tol independently in each engine; a delta within float noise of tol could
    pick a different rounds_run per engine.  Pin that this cannot happen on
    the driver's data: at every probed round the delta is either >> tol or
    << tol (the doc graph is a shallow DAG — deltas collapse to EXACTLY 0 at
    round 6), so engine-order float noise (~1e-12 relative) cannot flip the
    threshold test."""
    import os

    import duckdb

    from mongraph_spark.graphs import tpch
    from mongraph_spark.queries import graph_analytics as ga

    tol = ga.PR_CONV_TOL_BP / 10000.0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        tables = "region nation customer supplier part orders lineitem events documents embeddings"
        for t in tables.split():
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        checks = list(
            range(ga.PR_CONV_CHECK_EVERY, ga.PR_CONV_MAX_ITER + 1, ga.PR_CONV_CHECK_EVERY)
        )
        deltas = "\nUNION ALL\n".join(
            f"SELECT {k} AS k, max(abs(a.rank-b.rank)) AS d"
            f" FROM r{k} a JOIN r{k-1} b ON a.node_id = b.node_id"
            for k in checks
        )
        sql = tpch.oracle_with(
            "SELECT k, d FROM deltas ORDER BY k",
            extra_ctes=f"{ga._pagerank_unroll(ga.PR_CONV_MAX_ITER)},\ndeltas AS (\n{deltas}\n)",
        )
        rows = con.execute(sql).fetchall()
        assert rows
        for _k, d in rows:
            # every probe must be at least 100x away from the threshold in
            # one direction or the other — float noise is ~1e-12 relative
            assert d > 100 * tol or d < tol / 100, (sf_dir, _k, d, tol)
        con.close()
