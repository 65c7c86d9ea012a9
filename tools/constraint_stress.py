"""Measured evidence for the CHECK-constraint cost claims (round 9):

1. **Write-side enforcement is O(update batch), short-circuiting** — the
   per-constraint ``limit(1)`` job runs over the deduped update batch
   only, never the table, so a constrained upsert's wall should sit a
   small constant over the unconstrained one regardless of table size.
2. **ALTER validates existing data in ONE scan** — add_check_constraint
   on a populated REPL× table pays one short-circuiting full read; we
   report that wall next to the table build.
3. **Rejection is cheap** — a violating batch is refused before any
   staging I/O, so time-to-reject ~ the enforcement probe itself.

Usage: python tools/constraint_stress.py [--repl 16] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line; copy the numbers into COVERAGE.md BENCHNOTES.
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

from mongraph_spark.sources import merge as M  # noqa: E402
from tools.scale_stress import stress_session  # noqa: E402
from tools.store_occ_stress import _build, _corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = stress_session()
    spark.sparkContext.setLogLevel("WARN")

    root, build_s = _build(spark, args.sf_dir, args.repl, "constraint")
    batch = (
        _corpus(spark, args.sf_dir, args.repl)
        .filter(F.col("doc_id") % 100 == 7)  # ~1% slice across all buckets
        .withColumn("n_chars", F.col("n_chars") + 1)
        .localCheckpoint()  # pin the batch: we time the WRITE, not its lineage
    )
    n_batch = batch.count()

    # warm-up: the first upsert pays JVM/codegen cold costs AND consolidates
    # the fragmented build's touched buckets — both would be misattributed
    # to whichever variant runs first
    M.upsert(spark, root, batch, key="doc_id")

    def _best_of(n: int) -> float:
        walls = []
        for _ in range(n):
            t0 = time.time()
            M.upsert(spark, root, batch, key="doc_id")
            walls.append(time.time() - t0)
        return round(min(walls), 2)

    upsert_plain_s = _best_of(3)

    t0 = time.time()
    M.add_check_constraint(spark, root, "chars_nonneg", "n_chars >= 0")
    alter_scan_s = round(time.time() - t0, 2)

    upsert_constrained_s = _best_of(3)

    t0 = time.time()
    try:
        M.upsert(
            spark, root, batch.withColumn("n_chars", F.lit(-1)), key="doc_id"
        )
        raise AssertionError("violation not caught")
    except M.ConstraintViolation:
        reject_s = round(time.time() - t0, 2)

    n_rows = M.read_current(spark, root).count()
    print(
        json.dumps(
            {
                "repl": args.repl,
                "table_rows": n_rows,
                "batch_rows": n_batch,
                "build_s": round(build_s, 2),
                "upsert_plain_s": upsert_plain_s,
                "upsert_constrained_s": upsert_constrained_s,
                "enforcement_overhead_s": round(
                    upsert_constrained_s - upsert_plain_s, 2
                ),
                "alter_validation_scan_s": alter_scan_s,
                "violating_batch_reject_s": reject_s,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
