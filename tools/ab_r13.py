"""Round-13 A/B probes (guide §1: measure first, same-session pairs).

Each probe builds the OLD and NEW plan shapes for one candidate
optimization, verifies value identity on the small SF, then times both
at sf0.1 with the noop sink (warm, best-of-3).  Run:

    python tools/ab_r13.py pairs      # copurchase pairs: self-join vs basket-explode
    python tools/ab_r13.py eig        # eigenvector round: broadcast-max vs window-max
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mongraph_spark.graphs import tpch  # noqa: E402
from mongraph_spark.sparkutil import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"


def timed(label: str, fn, n: int = 3) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label}: {best:.3f} s")
    return best


def pairs_old(spark, sf_dir: str) -> DataFrame:
    eng = tpch.bulk_engine(spark, sf_dir)
    contains = (
        eng.store.edges_df()
        .filter(F.col("type") == "contains")
        .select(F.col("src").alias("order_id"), F.col("dst").alias("part_id"))
        .distinct()
    )
    a = contains.select("order_id", F.col("part_id").alias("part_a"))
    b = contains.select("order_id", F.col("part_id").alias("part_b"))
    return (
        a.join(b, "order_id")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def pairs_new(spark, sf_dir: str) -> DataFrame:
    eng = tpch.bulk_engine(spark, sf_dir)
    contains = (
        eng.store.edges_df()
        .filter(F.col("type") == "contains")
        .select(F.col("src").alias("order_id"), F.col("dst").alias("part_id"))
    )
    baskets = contains.groupBy("order_id").agg(
        F.array_sort(F.collect_set("part_id")).alias("parts")
    )
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(parts, (x, i) -> transform("
                "slice(parts, i + 2, size(parts)),"
                " y -> struct(x AS part_a, y AS part_b)))"
            )
        )
    )
    return (
        baskets.select(pair.alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def run_pairs() -> None:
    spark = get_spark("ab-pairs")
    for sf in (SF001,):
        old = sorted(tuple(r) for r in pairs_old(spark, sf).collect())
        new = sorted(tuple(r) for r in pairs_new(spark, sf).collect())
        assert old == new and len(old) > 0, (
            f"MISMATCH at {sf}: {len(old)} vs {len(new)} rows"
        )
        print(f"identity OK at {sf}: {len(old)} pair rows")
    # warm both once
    pairs_old(spark, SF01).write.format("noop").mode("overwrite").save()
    pairs_new(spark, SF01).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription("ab pairs: old self-join")
    t_old = timed("old (distinct + self-join + agg)", lambda: pairs_old(spark, SF01))
    spark.sparkContext.setJobDescription("ab pairs: new basket-explode")
    t_new = timed("new (collect_set + explode combos)", lambda: pairs_new(spark, SF01))
    print(f"speedup: {t_old / t_new:.2f}x")
    old = sorted(tuple(r) for r in pairs_old(spark, SF01).collect())
    new = sorted(tuple(r) for r in pairs_new(spark, SF01).collect())
    assert old == new, "MISMATCH at sf0.1"
    print(f"identity OK at sf0.1: {len(old)} pair rows")


def run_eig() -> None:
    from mongraph_spark import pregel
    from mongraph_spark.queries.graph_analytics import EIG_GRID, EIG_ROUNDS
    from mongraph_spark.sparkutil import const_part, maybe_broadcast

    spark = get_spark("ab-eig")

    def build(sf_dir: str, variant: str) -> DataFrame:
        eng = tpch.bulk_engine(spark, sf_dir)
        e = eng.store.edges_df().select("src", "dst")
        und = (
            e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
            .persist()
        )
        nodes = eng.store.nodes_df().select("node_id")
        n_nodes = nodes.count()
        cached = []

        def step_bcast(x):
            c = (
                x.join(und, x["node_id"] == und["src"])
                .select(F.col("dst").alias("node_id"), "score")
                .groupBy("node_id")
                .agg(F.sum("score").cast("decimal(38,0)").alias("c"))
                .persist()
            )
            cached.append(c)
            m = c.agg(F.max("c").alias("m"))
            return (
                nodes.join(maybe_broadcast(c, n_nodes), "node_id", "left")
                .crossJoin(F.broadcast(m))
                .selectExpr(
                    "node_id",
                    f"CAST((CAST({EIG_GRID} AS DECIMAL(38,0)) * coalesce(c, 0))"
                    " div m AS BIGINT) AS score",
                )
            )

        def step_window(x):
            # max folded into the same plan via a const-part window over c
            c = (
                x.join(und, x["node_id"] == und["src"])
                .select(F.col("dst").alias("node_id"), "score")
                .groupBy("node_id")
                .agg(F.sum("score").cast("decimal(38,0)").alias("c"))
            )
            from pyspark.sql import Window

            w = Window.partitionBy(const_part(F.col("node_id")))
            cm = c.withColumn("m", F.max("c").over(w))
            return (
                nodes.join(maybe_broadcast(cm, n_nodes), "node_id", "left")
                .selectExpr(
                    "node_id",
                    f"CAST((CAST({EIG_GRID} AS DECIMAL(38,0)) * coalesce(c, 0))"
                    " div coalesce(m, 1) AS BIGINT) AS score",
                )
            )

        step = step_bcast if variant == "bcast" else step_window
        x0 = nodes.select("node_id", F.lit(EIG_GRID).cast("long").alias("score"))
        try:
            x, _ = pregel.iterate(x0, step, max_rounds=EIG_ROUNDS, checkpoint_every=1)
        finally:
            und.unpersist()
            for c in cached:
                c.unpersist()
        coll = (F.col("node_id") / F.lit(10**12)).cast("long")
        return (
            x.withColumn("coll_code", coll)
            .groupBy("coll_code")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
                F.min("score").cast("long").alias("min_score"),
                F.max("score").cast("long").alias("max_score"),
                F.sum("score").cast("long").alias("sum_score"),
            )
        )

    old = sorted(tuple(r) for r in build(SF001, "bcast").collect())
    new = sorted(tuple(r) for r in build(SF001, "window").collect())
    assert old == new and old, f"MISMATCH at {SF001}"
    print(f"identity OK at sf0.01: {old}")
    build(SF01, "bcast").write.format("noop").mode("overwrite").save()
    build(SF01, "window").write.format("noop").mode("overwrite").save()
    t_old = timed("bcast-max (current)", lambda: build(SF01, "bcast"))
    t_new = timed("window-max (candidate)", lambda: build(SF01, "window"))
    print(f"speedup: {t_old / t_new:.2f}x")


if __name__ == "__main__":
    {"pairs": run_pairs, "eig": run_eig}[sys.argv[1]]()
