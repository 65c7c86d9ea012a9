"""TPC-H headline sanity ratio (VERDICT r5 #8): wall-clock the 22 q*
queries at a given SF on warm Spark (best-of-N, noop sink) against DuckDB
running each query's own oracle SQL on the same parquet files.

DuckDB is expected to win at laptop scale — a single-process vectorized
engine has none of Spark's scheduler/shuffle overhead, and THAT is the
published crossover argument: Spark's per-query fixed cost (~100-300 ms
scheduling + codegen) dominates at sf0.1 where the data fits in L3, while
the same plans scale horizontally to the 100 TB tier DuckDB cannot reach.
This records the honest per-query number instead of arguing it.

Usage: python tools/tpch_ratio.py [sf_dir] [--passes 3]
Prints one JSON line per query {name, spark_s, duckdb_s, ratio} and a
summary; copy into COVERAGE.md BENCHNOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mongraph_spark.sparkutil import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("tpch_ratio")
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()  # warm
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = entrymod._all()
    qnames = sorted(
        (n for n in qs if n[0] == "q" and n[1].isdigit()),
        key=lambda n: int(n[1 : n.index("_")]),
    )
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
                "summary": "tpch22",
                "sf_dir": args.sf_dir,
                "spark_total_s": round(tot_s, 2),
                "duckdb_total_s": round(tot_d, 2),
                "ratio_total": round(tot_s / tot_d, 1),
                "passes": args.passes,
            }
        )
    )


if __name__ == "__main__":
    main()
