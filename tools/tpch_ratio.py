"""TPC-H headline sanity ratio (VERDICT r5 #8), PINNED PROTOCOL (r11):
wall-clock the 22 q* queries at a given SF on Spark against DuckDB
running each query's own oracle SQL on the same parquet files.

DuckDB is expected to win at laptop scale — a single-process vectorized
engine has none of Spark's scheduler/shuffle overhead, and THAT is the
published crossover argument: Spark's per-query fixed cost (~100-300 ms
scheduling + codegen) dominates at sf0.1 where the data fits in L3, while
the same plans scale horizontally to the 100 TB tier DuckDB cannot reach.
This records the honest per-query number instead of arguing it.

The r6→r10 drift (10.2× → 13.9×) was attributed to scheduler noise; the
protocol is now FIXED so any two runs are comparable:

1. FRESH JVM: the tool refuses to reuse an active SparkSession (gateway
   state, JIT warmth, and GC pressure from whatever ran before are the
   noise source being eliminated) — run it as its own process.
2. Deterministic session config, recorded in the summary line: app name
   ``tpch_ratio``, ``local[$SPARK_GRAFT_CPUS|32]``, shuffle partitions /
   AQE / broadcast threshold as the repo's get_spark pins them.
3. Warm-up: one full UNRECORDED pass of all 22 queries on both engines
   (JIT + codegen cache + page cache), then ``--passes`` (default 5)
   recorded passes, best-of per query.
4. DuckDB: one fresh in-process connection, default thread count,
   recorded in the summary.

Acceptance gate (VERDICT r10 #3): two back-to-back runs of this pinned
protocol must land within 10% on ratio_total; the pair goes in
COVERAGE.md BENCHNOTES.

Usage: python tools/tpch_ratio.py [sf_dir] [--passes 5] [--anchors]
Prints one JSON line per query {name, spark_s, duckdb_s, ratio} and a
summary carrying the recorded config.

``--anchors`` (VERDICT r11 order #5) runs the same pinned protocol over
bench.py's permanent ANCHOR_QUERIES instead of the 22 TPC-H rows, so every
headline family (graph, dedup, ANN, text, events, streaming, store,
corpus, ER) carries a spark-vs-duckdb number — each anchor's DuckDB side
is its own oracle-SQL twin, which exists by construction for every
oracle-gated row.  Anchors without a SQL twin are skipped and named in
the summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mongraph_spark.sparkutil import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

PROTOCOL = "r11-pinned"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--anchors", action="store_true")
    args = ap.parse_args()
    if SparkSession.getActiveSession() is not None:
        raise SystemExit(
            "tpch_ratio must start its own fresh JVM (pinned protocol); "
            "run it as a standalone process"
        )
    spark = get_spark("tpch_ratio")
    conf = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.master",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.driver.memory",
        )
    }
    con = duckdb.connect()
    duck_threads = con.execute(
        "SELECT current_setting('threads')"
    ).fetchone()[0]
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = entrymod._all()
    skipped = []
    if args.anchors:
        from bench import ANCHOR_QUERIES

        qnames = [n for n in ANCHOR_QUERIES if n in oracles]
        skipped = [n for n in ANCHOR_QUERIES if n not in oracles]
        # anchors ride the derived graph store: build it once, outside
        # the timings (bench.py's own posture)
        from mongraph_spark.graphs import tpch

        tpch.materialized_graph(spark, args.sf_dir)
    else:
        qnames = sorted(
            (n for n in qs if n[0] == "q" and n[1].isdigit()),
            key=lambda n: int(n[1 : n.index("_")]),
        )
    # warm-up: one full unrecorded pass on both engines
    for name in qnames:
        qs[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        con.execute(oracles[name]).fetchall()
    tot_s = tot_d = 0.0
    rows = []
    for name in qnames:
        best_s = best_d = float("inf")
        for _ in range(args.passes):
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best_s = min(best_s, time.time() - t0)
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            best_d = min(best_d, time.time() - t0)
        tot_s += best_s
        tot_d += best_d
        rows.append(
            {
                "query": name,
                "spark_s": round(best_s, 3),
                "duckdb_s": round(best_d, 3),
                "ratio": round(best_s / best_d, 1) if best_d > 0 else None,
            }
        )
        print(json.dumps(rows[-1]))
    print(
        json.dumps(
            {
                "summary": "anchors" if args.anchors else "tpch22",
                "skipped_no_oracle": skipped,
                "protocol": PROTOCOL,
                "sf_dir": args.sf_dir,
                "spark_total_s": round(tot_s, 2),
                "duckdb_total_s": round(tot_d, 2),
                "ratio_total": round(tot_s / tot_d, 1),
                "passes": args.passes,
                "warmup": "1 full pass both engines",
                "spark_conf": conf,
                "duckdb_threads": duck_threads,
            }
        )
    )


if __name__ == "__main__":
    main()
