"""Scale-stress evidence for the r12/r13-touched GRAPH and store ops
(VERDICT r12 order #4): replicate the base tables REPL× into disjoint
graph copies (every key offset per replica ⇒ nodes, edges, baskets and
communities all grow LINEARLY — the "more products, more orders" growth
shape; degree distribution per copy is preserved), build the stress
graph store, and time each op at 1× and REPL× in one warm local[32]
session.

Covers: the Louvain pair's shared machinery (pairs build + LPA + one
move sweep via graph_louvain_refine), the eigenvector pair (via
graph_eigenvector_centrality — the converged twin shares the step
builder), graph_triangle_count, graph_kcore, and the store upsert path
(init + trickle upsert + compact, the row_tracking lifecycle shape).

Usage: python tools/graph_stress.py [--repl 16]
Writes one JSON line; copy numbers into COVERAGE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongraph_spark.sparkutil import get_spark, read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRESS = os.path.join(tempfile.gettempdir(), "mg_graph_stress")

# key offsets must clear every natural key at sf0.1 AND stay far under
# the node-id collection-code base (10^12): per-table max keys are
# ~600k, so a 10^7 stride per replica is safe for repl <= 64
STRIDE = 10**7


def replicate(spark, repl: int) -> str:
    shutil.rmtree(STRESS, ignore_errors=True)
    os.makedirs(STRESS, exist_ok=True)
    r = F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("r")
    off = (F.col("r") * STRIDE).cast("long")

    # dimensions shared by every replica (they don't drive the ops under
    # test and keeping them fixed avoids rewriting nation/region FKs)
    for t in ("region", "nation"):
        read_table(spark, SF_DIR, t).write.parquet(os.path.join(STRESS, f"{t}.parquet"))

    cust = read_table(spark, SF_DIR, "customer")
    cust.select("*", r).withColumn("c_custkey", F.col("c_custkey") + off).drop(
        "r"
    ).write.parquet(os.path.join(STRESS, "customer.parquet"))

    supp = read_table(spark, SF_DIR, "supplier")
    supp.select("*", r).withColumn("s_suppkey", F.col("s_suppkey") + off).drop(
        "r"
    ).write.parquet(os.path.join(STRESS, "supplier.parquet"))

    part = read_table(spark, SF_DIR, "part")
    part.select("*", r).withColumn("p_partkey", F.col("p_partkey") + off).drop(
        "r"
    ).write.parquet(os.path.join(STRESS, "part.parquet"))

    orders = read_table(spark, SF_DIR, "orders")
    orders.select("*", r).withColumn(
        "o_orderkey", F.col("o_orderkey") + off
    ).withColumn("o_custkey", F.col("o_custkey") + off).drop("r").write.parquet(
        os.path.join(STRESS, "orders.parquet")
    )

    li = read_table(spark, SF_DIR, "lineitem")
    li.select("*", r).withColumn(
        "l_orderkey", F.col("l_orderkey") + off
    ).withColumn("l_partkey", F.col("l_partkey") + off).withColumn(
        "l_suppkey", F.col("l_suppkey") + off
    ).drop("r").write.parquet(os.path.join(STRESS, "lineitem.parquet"))

    docs = read_table(spark, SF_DIR, "documents")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    docs.select("*", r).withColumn(
        "doc_id", F.col("doc_id") + F.col("r") * n_doc
    ).drop("r").write.parquet(os.path.join(STRESS, "documents.parquet"))
    return STRESS


def timed(fn) -> float:
    t0 = time.time()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def store_upsert_lifecycle(spark, sf_dir: str):
    from mongraph_spark.sources import merge as M

    root = os.path.join(tempfile.gettempdir(), "mg_upsert_stress")
    shutil.rmtree(root, ignore_errors=True)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    M.init_table(docs, root, key="doc_id", n_buckets=32)
    M.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") % 997 == 0).withColumn(
            "n_chars", F.col("n_chars") + 1
        ),
        key="doc_id",
    )
    M.compact(spark, root)
    return M.read_current(spark, root)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    args = ap.parse_args()
    spark = get_spark("graph-stress")

    from mongraph_spark.queries.graph_analytics import (
        graph_eigenvector_centrality,
        graph_kcore,
        graph_louvain_refine,
        graph_triangle_count,
    )

    def suite(sf_dir: str) -> dict:
        return {
            "louvain_refine": timed(lambda: graph_louvain_refine(spark, sf_dir)),
            "eigenvector": timed(
                lambda: graph_eigenvector_centrality(spark, sf_dir)
            ),
            "triangle_count": timed(lambda: graph_triangle_count(spark, sf_dir)),
            "kcore": timed(lambda: graph_kcore(spark, sf_dir)),
            "store_upsert": timed(lambda: store_upsert_lifecycle(spark, sf_dir)),
        }

    from mongraph_spark.graphs import tpch

    out = {"metric": "graph_stress", "repl": args.repl, "sf_base": SF_DIR}
    tpch.materialized_graph(spark, SF_DIR)  # cache build outside the timings
    base = suite(SF_DIR)
    stress_dir = replicate(spark, args.repl)
    tpch.materialized_graph(spark, stress_dir)
    big = suite(stress_dir)
    out["wall_1x"] = base
    out[f"wall_{args.repl}x"] = big
    out["ratio"] = {
        k: round(big[k] / base[k], 2) if base[k] else None for k in base
    }
    print(json.dumps(out))
    shutil.rmtree(STRESS, ignore_errors=True)
    # the stress graph cache is keyed by the stress dir basename — drop it
    # so reruns rebuild from fresh replication
    shutil.rmtree(
        os.path.join(
            os.environ.get("MONGRAPH_GRAPH_CACHE", "/root/repo/.graph_cache"),
            os.path.basename(STRESS),
        ),
        ignore_errors=True,
    )


if __name__ == "__main__":
    main()
