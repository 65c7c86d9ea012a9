"""Measured evidence for the deletion-vector scale claims (round 9):

1. **Vector delete is O(matched keys), copy-on-write delete is O(touched
   buckets)** — a sparse predicate that matches a few rows in EVERY
   bucket forces delete_where to rewrite the whole table, while
   delete_where_dv pays one predicate scan plus a KB-scale sidecar
   write.  We time both on identical REPL× stores and report the bytes
   each version added on disk.
2. **Read overhead of pending vectors is one small anti-join** — wall of
   a full aggregate over the table before the delete, with pending
   vectors, and after compact materializes them.

Usage: python tools/dv_stress.py [--repl 16] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line; copy the numbers into COVERAGE.md BENCHNOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongraph_spark.sources import merge as M  # noqa: E402
from tools.scale_stress import stress_session  # noqa: E402
from tools.store_occ_stress import _build  # noqa: E402

def _pred():
    # a sparse every-bucket predicate: ~0.2% of rows, spread over all ids
    # (built lazily — Column exprs need an active SparkContext)
    return (F.col("doc_id") % 499) == 7


def _tree_bytes(path: str) -> int:
    total = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            total += os.path.getsize(os.path.join(dp, f))
    return total


def _version_bytes(root: str, ver: str) -> int:
    return _tree_bytes(os.path.join(root, ver))


def _agg_wall(spark, root: str) -> float:
    t0 = time.time()
    M.read_current(spark, root).agg(
        F.count(F.lit(1)), F.sum("n_chars")
    ).collect()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = stress_session()
    spark.sparkContext.setLogLevel("WARN")

    out: dict = {"repl": args.repl}

    # --- copy-on-write baseline -------------------------------------------------
    root_cow, build_s = _build(spark, args.sf_dir, args.repl, "dv_cow")
    out["build_s"] = round(build_s, 2)
    out["read_clean_s"] = round(_agg_wall(spark, root_cow), 2)
    t0 = time.time()
    ver = M.delete_where(spark, root_cow, _pred())
    out["cow_delete_s"] = round(time.time() - t0, 2)
    out["cow_version_bytes"] = _version_bytes(root_cow, ver)
    shutil.rmtree(root_cow, ignore_errors=True)

    # --- deletion vectors ---------------------------------------------------------
    root_dv, _ = _build(spark, args.sf_dir, args.repl, "dv_mor")
    t0 = time.time()
    ver = M.delete_where_dv(spark, root_dv, _pred())
    out["dv_delete_s"] = round(time.time() - t0, 2)
    out["dv_version_bytes"] = _version_bytes(root_dv, ver)
    out["read_pending_s"] = round(_agg_wall(spark, root_dv), 2)
    t0 = time.time()
    _, compacted = M.compact(spark, root_dv, max_files_per_bucket=1)
    out["compact_materialize_s"] = round(time.time() - t0, 2)
    out["compacted_buckets"] = len(compacted)
    out["read_materialized_s"] = round(_agg_wall(spark, root_dv), 2)
    shutil.rmtree(root_dv, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
