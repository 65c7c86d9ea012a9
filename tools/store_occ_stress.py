"""Measured evidence for the round-9 store OCC claims (VERDICT r8 #5):

1. **Writer latency behind a long compaction** — the claim-first
   (``occ="failfast"``) compact holds the version claim across its whole
   Spark job, so a concurrent bucket-disjoint upsert spins in
   ``commit_with_retry`` until the compaction commits; the rebase compact
   holds no claim during compute, so the same upsert commits immediately.
   We fragment every bucket of a REPL× documents store, run compact and a
   disjoint single-doc upsert in two threads, and report the upsert's
   commit latency under each protocol.

2. **Shallow clone is O(metadata)** — clone the same REPL× store and
   report the clone wall time next to the initial table build time.

Usage: python tools/store_occ_stress.py [--repl 16] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line; copy the numbers into COVERAGE.md BENCHNOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongraph_spark.sources import merge as M  # noqa: E402
from tools.scale_stress import stress_session  # noqa: E402


def _corpus(spark, sf_dir: str, repl: int):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "source", "n_chars"
    )
    out = docs
    for i in range(1, repl):
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                "source",
                "n_chars",
            )
        )
    return out


def _build(spark, sf_dir: str, repl: int, tag: str) -> tuple[str, float]:
    root = os.path.join(tempfile.gettempdir(), f"mg_occ_stress_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    # 64 write tasks -> ~64 small files per bucket dir: real compaction work
    M.init_table(_corpus(spark, sf_dir, repl).repartition(64), root,
                 key="doc_id", n_buckets=16)
    return root, time.time() - t0


def _race(spark, root: str, occ: str) -> dict:
    """Compact (slow) + disjoint upsert (tiny) in two threads; return the
    upsert's commit latency and the compaction's wall."""
    out: dict = {}
    batch = spark.createDataFrame(
        [(555_000_111, "stress", 1)], "doc_id long, source string, n_chars long"
    )

    def compacter():
        t0 = time.time()
        ver, buckets = M.compact(spark, root, max_files_per_bucket=1, occ=occ)
        out["compact_s"] = round(time.time() - t0, 2)
        out["compacted_buckets"] = len(buckets)

    def upserter():
        time.sleep(0.5)  # let the compaction get going first
        t0 = time.time()
        M.commit_with_retry(
            lambda: M.upsert(spark, root, batch, key="doc_id"),
            max_retries=1000,
            backoff_s=0.1,
        )
        out["upsert_latency_s"] = round(time.time() - t0, 2)

    t1, t2 = threading.Thread(target=compacter), threading.Thread(target=upserter)
    t1.start(), t2.start()
    t1.join(600), t2.join(600)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = stress_session()
    spark.sparkContext.setLogLevel("WARN")

    root_ff, build_s = _build(spark, args.sf_dir, args.repl, "failfast")
    ff = _race(spark, root_ff, occ="failfast")
    root_rb, _ = _build(spark, args.sf_dir, args.repl, "rebase")
    rb = _race(spark, root_rb, occ="rebase")

    t0 = time.time()
    clone_root = os.path.join(tempfile.gettempdir(), "mg_occ_stress_clone")
    shutil.rmtree(clone_root, ignore_errors=True)
    M.shallow_clone(root_rb, clone_root)
    clone_s = round(time.time() - t0, 4)
    n_rows = M.read_current(spark, clone_root).count()

    print(json.dumps({
        "repl": args.repl,
        "build_s": round(build_s, 2),
        "failfast": ff,
        "rebase": rb,
        "shallow_clone_s": clone_s,
        "clone_rows": n_rows,
    }))
    for r in (root_ff, root_rb, clone_root):
        shutil.rmtree(r, ignore_errors=True)


if __name__ == "__main__":
    main()
