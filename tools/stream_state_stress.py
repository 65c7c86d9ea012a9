"""Streaming state-size evidence (VERDICT r5 #9): prove the watermark
actually bounds state growth for every stateful twin.

Replicates the events table REPL× into ``.stream_stress/`` WITHOUT
extending the time range or the key space (event_id is shifted per replica
to keep it unique; user_id/event_type/ts stay verbatim), then runs each
stateful twin at 1× and at REPL× and records the state store's
rows/bytes from the final progress event (captured by
``run_to_table``).  The claim under test: state size tracks
(open windows × keys) — fixed here by construction — not input volume, so
rows should stay ~flat at 16× input for the window/agg twins.  The
exceptions prove the rule and are reported, not hidden: the dedup twin
keys state on event_id (state rows ∝ distinct ids within the watermark —
the operator's documented cost), and the stream-stream joins buffer rows
within the join window.

Usage: python tools/stream_state_stress.py [--repl 16] [--sf-dir ...]
Prints one JSON line per twin; copy into COVERAGE.md BENCHNOTES.
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

from mongraph_spark.sparkutil import get_spark  # noqa: E402
from mongraph_spark.streaming import events as se  # noqa: E402

STRESS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".stream_stress"
)

# every registered stateful twin (memory-sink complete/append aggregations,
# dedup, stream-stream joins); the stateless broadcast-join twin is omitted
STATEFUL_TWINS = [
    "streaming_ddsketch_quantiles",
    "streaming_tumbling_window",
    "streaming_sliding_window",
    "streaming_session_counts",
    "streaming_stateful_user_totals",
    "streaming_dedup_events",
    "streaming_hll_distinct",
    "streaming_count_min",
    "streaming_slo_burn_rate",
    "streaming_hourly_top_type",
    "streaming_seasonal_anomaly",
    "streaming_markov_transitions",
    "streaming_click_purchase_join",
    "streaming_click_purchase_outer",
    # r10 continuation twins (VERDICT r10 #6): rollup-state monitors whose
    # state is the finisher's ENTIRE bounded input — |types|x|days| for
    # theta, the vocabulary pair-counts for KL.  Replication keeps
    # types/days/vocab fixed, so state rows must hold ~1.0 at 16x.
    "streaming_theta_forecast",
    "streaming_kl_drift",
]

# the SCD2 twin keeps NO Spark state-store state (foreachBatch -> CoW store
# tables); its "state" is the dimension itself — current-state rows = live
# keys, closed log rows = changed keys.  Replication offsets doc_id, so BOTH
# grow ~linearly with keys BY DESIGN (the dimension's natural size, what the
# warehouse stores anyway) — reported as its own row class, not hidden.
STORE_STATE_TWINS = ["streaming_scd2_history"]


def build_stress_dir(spark, sf_dir: str, repl: int) -> None:
    shutil.rmtree(STRESS_DIR, ignore_errors=True)
    os.makedirs(STRESS_DIR)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = ev.count()
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    # same users, same types, same timestamps -> same windows and keys;
    # only the volume (and distinct event_ids) grows
    scaled = ev.crossJoin(reps).withColumn(
        "event_id", F.col("event_id") + F.col("rep") * F.lit(10_000_000)
    ).drop("rep")
    # the streaming source globs a FILE named events.parquet (matching the
    # testdata layout), so land the replicated table as one file
    tmp = os.path.join(STRESS_DIR, "_tmp_events")
    scaled.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        p for p in os.listdir(tmp) if p.startswith("part-") and p.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), os.path.join(STRESS_DIR, "events.parquet"))
    shutil.rmtree(tmp)
    # documents: doc_id offset per replica (new keys), source/text verbatim
    # (same groups and the same vocabulary) — the KL twin's state must stay
    # flat, the SCD2 twin's dimension must grow linearly in keys
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dscaled = docs.crossJoin(reps).withColumn(
        "doc_id", F.col("doc_id") + F.col("rep") * F.lit(int(n_doc))
    ).drop("rep")
    tmp = os.path.join(STRESS_DIR, "_tmp_docs")
    dscaled.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        p for p in os.listdir(tmp) if p.startswith("part-") and p.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), os.path.join(STRESS_DIR, "documents.parquet"))
    shutil.rmtree(tmp)
    print(f"# stress dir: {n} -> {n * repl} events, same keys/time-range")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    spark = get_spark("stream_state_stress")
    build_stress_dir(spark, args.sf_dir, args.repl)
    twins = [
        t for t in (args.only or STATEFUL_TWINS) if t not in STORE_STATE_TWINS
    ]
    for name in twins:
        fn = se.QUERIES[name]
        row = {"twin": name, "repl": args.repl}
        for label, d in (("base", args.sf_dir), ("stress", STRESS_DIR)):
            t0 = time.time()
            n_out = fn(spark, d).count()
            wall = round(time.time() - t0, 2)
            rows = sum(m.get("numRowsTotal") or 0 for m in se.LAST_STATE_METRICS)
            mem = sum(m.get("memoryUsedBytes") or 0 for m in se.LAST_STATE_METRICS)
            row[label] = {
                "out_rows": n_out,
                "state_rows": rows,
                "state_bytes": mem,
                "wall_s": wall,
                "n_state_ops": len(se.LAST_STATE_METRICS),
            }
        b, s = row["base"], row["stress"]
        row["state_rows_ratio"] = (
            round(s["state_rows"] / b["state_rows"], 2) if b["state_rows"] else None
        )
        print(json.dumps(row))
    if args.only is None or any(t in STORE_STATE_TWINS for t in (args.only or [])):
        import tempfile

        from mongraph_spark.sources import merge as M

        app_id = spark.sparkContext.applicationId
        for name in STORE_STATE_TWINS:
            if args.only is not None and name not in args.only:
                continue
            fn = se.QUERIES[name]
            row = {"twin": name, "repl": args.repl, "state_model": "key-bounded"}
            for label, d in (("base", args.sf_dir), ("stress", STRESS_DIR)):
                sf_tag = os.path.basename(os.path.normpath(d))
                root = os.path.join(
                    tempfile.gettempdir(), f"mg_ivm_shared_{app_id}_{sf_tag}"
                )
                t0 = time.time()
                n_out = fn(spark, d).count()
                wall = round(time.time() - t0, 2)
                cur_rows = M.read_current(spark, root + "_scd2cur").count()
                closed_rows = spark.read.parquet(root + "_scd2log").count()
                row[label] = {
                    "out_rows": n_out,
                    "cur_rows": cur_rows,
                    "closed_rows": closed_rows,
                    "wall_s": wall,
                }
            b, s = row["base"], row["stress"]
            row["cur_rows_ratio"] = (
                round(s["cur_rows"] / b["cur_rows"], 2) if b["cur_rows"] else None
            )
            row["closed_rows_ratio"] = (
                round(s["closed_rows"] / b["closed_rows"], 2)
                if b["closed_rows"]
                else None
            )
            print(json.dumps(row))


if __name__ == "__main__":
    main()
