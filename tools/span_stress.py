"""Scale-stress evidence for the substring-span dedup family: replicate
``documents`` REPL× into ``.span_stress/`` (replica 0 verbatim; replicas
1+ append a per-replica token to every ≥4-letter word, which rewrites
almost every 8-gram so the gram index grows linearly WITHOUT growing the
per-gram posting lists quadratically — the same replication contract
scale_stress.py uses for the LSH suite), then time dedup_span_exact /
dedup_span_trim / corpus_span_decontamination at 1× and REPL× in one warm
session.  Claim under test: wall time tracks total gram mass (linear),
because the self-join output is bounded by Σ df(gram)² and df stays O(1)
for non-planted grams.

Usage: python tools/span_stress.py [--repl 16] [--sf-dir ...]
Prints one JSON line per op; copy into COVERAGE.md BENCHNOTES.
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

from mongraph_spark.queries import dedup  # noqa: E402
from mongraph_spark.sparkutil import get_spark  # noqa: E402

STRESS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".span_stress"
)

OPS = ["dedup_span_exact", "dedup_span_trim", "corpus_span_decontamination"]


def build_stress_dir(spark, sf_dir: str, repl: int) -> None:
    shutil.rmtree(STRESS_DIR, ignore_errors=True)
    os.makedirs(STRESS_DIR)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    rewritten = F.expr(
        "array_join(transform(split(text, ' '), "
        "w -> CASE WHEN length(w) >= 4 AND rep > 0 "
        "THEN concat(w, 'r', CAST(rep AS STRING)) ELSE w END), ' ')"
    )
    scaled = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(100_000))
        .withColumn("text", rewritten)
        .drop("rep")
    )
    scaled.write.mode("overwrite").parquet(os.path.join(STRESS_DIR, "documents.parquet"))
    print(f"# span stress dir: {n} -> {n * repl} docs")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark("span_stress")
    build_stress_dir(spark, args.sf_dir, args.repl)
    for name in OPS:
        fn = dedup.QUERIES[name]
        row = {"op": name, "repl": args.repl}
        for label, d in (("base", args.sf_dir), ("stress", STRESS_DIR)):
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            n_out = fn(spark, d).count()
            row[label] = {"out_rows": n_out, "wall_s": round(time.time() - t0, 2)}
        row["wall_ratio"] = round(
            row["stress"]["wall_s"] / max(row["base"]["wall_s"], 0.01), 1
        )
        print(json.dumps(row))


if __name__ == "__main__":
    main()
