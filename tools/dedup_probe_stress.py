"""Bucketed-state probe cost at 16x accumulated corpus (VERDICT r7 #3).

Builds the streaming LSH twin's band index two ways — the bucketed+sorted
warehouse table the twin now writes, and the plain parquet dir it wrote
before r8 — at REPL x the sf0.1 corpus's band rows (doc_ids shifted per
replica, band keys kept verbatim so collision density is unchanged), then
measures ONE micro-batch's candidate probe join against each.  The claim
under test: the bucketed index is read IN PLACE (only the batch side
shuffles), so probe wall and shuffled bytes stay ~flat as the index grows,
while the plain-parquet probe re-shuffles the whole accumulated index every
batch.

Usage: python tools/dedup_probe_stress.py [--repl 16] [--sf-dir ...]
Prints one JSON line per variant; copy into COVERAGE.md BENCHNOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongraph_spark.sparkutil import get_spark  # noqa: E402, F401

PLAIN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".probe_stress"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from mongraph_spark.queries.dedup import N_BANDS, _banded_sigs, _shingles, dup_corpus
    from mongraph_spark.streaming.events import (
        STATE_BUCKETS,
        _append_bucketed,
        _fresh_state_table,
    )
    from tools.scale_stress import _stage_totals

    from tools.scale_stress import stress_session

    spark = stress_session()
    spark.sparkContext.setLogLevel("WARN")

    corpus = dup_corpus(spark, args.sf_dir, drop_last=2)
    shingled = corpus.select(
        "doc_id", _shingles(F.split(F.col("text"), " ")).alias("shingles")
    )
    bl = _banded_sigs(shingled).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(b), F.col(f"band{b}"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band_cell"),
    ).localCheckpoint(eager=True)
    n_base = bl.count()

    # accumulated index = REPL shifted copies of the corpus's band rows,
    # written per-replica exactly as the twin appends per micro-batch
    tab = "probe_stress_band_idx"
    _fresh_state_table(spark, tab)
    import shutil

    shutil.rmtree(PLAIN_DIR, ignore_errors=True)
    t0 = time.perf_counter()
    for i in range(args.repl):
        rep = bl.select(
            (F.col("doc_id") + F.lit((i + 1) * 1_000_000_000)).alias("doc_id"),
            "band_cell",
        )
        _append_bucketed(rep, tab, "band_cell")
        rep.write.mode("append").parquet(PLAIN_DIR)
    print(
        f"BUILD {args.repl}x index: {n_base * args.repl} rows, "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    # At this SF the batch's band rows broadcast, and BOTH layouts probe
    # without any shuffle (measured: shuffle_read 0 for both).  The layout
    # matters in the SMJ regime — the arriving batch's band mass too large
    # to broadcast, which is the 100 TB ingest shape — so that regime is
    # what this tool measures: broadcast off, plans degrade to SMJ, and
    # only the bucketed layout keeps the accumulated index un-shuffled.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probes = {
        "bucketed_table": lambda: spark.table(tab),
        "plain_parquet": lambda: spark.read.parquet(PLAIN_DIR),
    }
    for name, idx_fn in probes.items():
        for rep in range(2):  # pass1 + warm
            before = _stage_totals()
            t0 = time.perf_counter()
            idx = idx_fn().select("band_cell", F.col("doc_id").alias("id_y"))
            n = (
                bl.join(idx, "band_cell")
                .filter(F.col("id_y") != F.col("doc_id"))
                .count()
            )
            wall = time.perf_counter() - t0
            after = _stage_totals()
            rec = {
                "probe": name,
                "pass": rep + 1,
                "wall_sec": round(wall, 2),
                "candidates": n,
                "shuffle_read_bytes": after["shuffle_read_bytes"]
                - before["shuffle_read_bytes"],
            }
            print("PROBE " + json.dumps(rec), flush=True)
    spark.sql(f"DROP TABLE IF EXISTS {tab}")
    shutil.rmtree(PLAIN_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
