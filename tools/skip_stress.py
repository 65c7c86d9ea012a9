"""Scale-stress evidence for manifest-stats file skipping (round 9):
build a 16×-sf0.1 CoW store (lineitem-sized synthetic rows keyed on a
long id with a value column), cluster it with ``compact(cluster_by=)``,
then compare a selective range read through ``read_where`` (planning-time
file pruning from the ``_stats.json`` sidecar) against the same filter
over ``read_current`` (footer-level skipping only) — files scanned and
wall time, warm, in one session.

Usage: python tools/skip_stress.py [--rows 4000000] [--buckets 16] [--files 8]
Writes a JSON summary line; copy the numbers into COVERAGE.md.
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

from mongraph_spark.sparkutil import get_spark  # noqa: E402
from mongraph_spark.sources import merge as M  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("skip_stress")
    root = os.path.join(tempfile.gettempdir(), "mg_skip_stress")
    shutil.rmtree(root, ignore_errors=True)

    # value v spans [0, rows*10); uniformly spread so a 1% range predicate
    # is selective and honest (no pathological clustering given for free)
    df = spark.range(args.rows).select(
        F.col("id"), (F.col("id") * 10 + F.pmod(F.xxhash64("id"), F.lit(10))).alias("v")
    )
    t0 = time.time()
    M.init_table(df.repartition(args.buckets * args.files), root, key="id",
                 n_buckets=args.buckets)
    t_init = time.time() - t0

    t0 = time.time()
    ver, compacted = M.compact(
        spark, root, max_files_per_bucket=args.files, cluster_by="v"
    )
    t_cluster = time.time() - t0

    lo, hi = 0, args.rows // 10  # ~1% of the v domain
    # warm both paths once (footers, JIT)
    M.read_where(spark, root, "v", lo, hi).count()
    full_df = M.read_current(spark, root)
    full_df.filter((F.col("v") >= lo) & (F.col("v") <= hi)).count()

    t0 = time.time()
    pruned = M.read_where(spark, root, "v", lo, hi)
    n1 = pruned.count()
    t_pruned = time.time() - t0
    files_pruned_scan = len(pruned.inputFiles())

    t0 = time.time()
    full = M.read_current(spark, root).filter(
        (F.col("v") >= lo) & (F.col("v") <= hi)
    )
    n2 = full.count()
    t_full = time.time() - t0
    files_full_scan = len(full.inputFiles())

    assert n1 == n2, (n1, n2)
    print(json.dumps({
        "rows": args.rows,
        "buckets": args.buckets,
        "n_compacted_buckets": len(compacted),
        "init_s": round(t_init, 2),
        "cluster_compact_s": round(t_cluster, 2),
        "range_rows": n1,
        "files_scanned_read_where": files_pruned_scan,
        "files_scanned_full": files_full_scan,
        "wall_read_where_s": round(t_pruned, 2),
        "wall_full_filter_s": round(t_full, 2),
    }))


if __name__ == "__main__":
    main()
