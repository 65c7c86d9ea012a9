"""Scale-stress evidence for the round-10-continuation ops (the heavy
rows of the inference sweep): replicate the sf0.1 inputs REPL× and time
the op at 1x and REPLx in one warm local[32] session.

Replication shapes (each chosen so the measured work grows the way the
op's real input would, not degenerately):

- events -> ``stats_bradley_terry`` / ``events_binseg_changepoint``:
  user_id offset per replica, so user-day duel volume grows LINEARLY
  (more users), never quadratically (the same user never gains 16x
  events per day, which no real tenant exhibits).
- embeddings -> ``ann_srp_lsh``: vec_id offset per replica AND a
  circular dim-rotation per replica — verbatim copies would share every
  SRP band (one quadratic dup-class per vector, which no bucketed
  design survives); rotation rewrites the signature so candidate volume
  stays near-linear (what we measure).
- part -> ``er_golden_record``: key offset per replica plus a replica
  token appended to the brand (new blocks), so block count scales and
  block SIZE stays fixed — the production ER shape.
- documents -> ``store_row_tracking``-shaped lifecycle: doc_id offset;
  measures init + trickle upsert + compact on a 16x row-tracking table.

Usage: python tools/inference_stress.py [--repl 16]
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
STRESS = os.path.join(tempfile.gettempdir(), "mg_inference_stress")


def replicate(spark, repl: int) -> str:
    shutil.rmtree(STRESS, ignore_errors=True)
    os.makedirs(STRESS, exist_ok=True)
    r = F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("r")

    ev = read_table(spark, SF_DIR, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    ev.select("*", r).withColumn(
        "user_id", F.col("user_id") + F.col("r") * n_users
    ).withColumn(
        "event_id", F.col("event_id") * repl + F.col("r")
    ).drop("r").write.parquet(os.path.join(STRESS, "events.parquet"))

    emb = read_table(spark, SF_DIR, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    emb.select("*", r).withColumn(
        "vec_id", F.col("vec_id") + F.col("r") * n_vec
    ).withColumn(
        "embedding",
        F.expr(
            "concat(slice(embedding, (r % 64) + 1, 64 - (r % 64)),"
            " slice(embedding, 1, r % 64))"
        ),
    ).drop("r").write.parquet(os.path.join(STRESS, "embeddings.parquet"))

    part = read_table(spark, SF_DIR, "part")
    n_part = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    part.select("*", r).withColumn(
        "p_partkey", F.col("p_partkey") + F.col("r") * n_part
    ).withColumn(
        "p_brand", F.concat_ws("_", "p_brand", F.col("r").cast("string"))
    ).drop("r").write.parquet(os.path.join(STRESS, "part.parquet"))

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


def row_tracking_lifecycle(spark, sf_dir: str):
    from mongraph_spark.sources import merge as M

    root = os.path.join(tempfile.gettempdir(), "mg_rt_stress")
    shutil.rmtree(root, ignore_errors=True)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    M.init_table(docs, root, key="doc_id", n_buckets=32, row_tracking=True)
    M.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") % 997 == 0).withColumn(
            "n_chars", F.col("n_chars") + 1
        ),
        key="doc_id",
    )
    M.compact(spark, root)
    return M.read_current(spark, root, with_row_ids=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=16)
    args = ap.parse_args()
    spark = get_spark("inference-stress")

    from mongraph_spark.queries.dedup import dedup_bbit_minhash_curve
    from mongraph_spark.queries.inference import (
        ann_srp_band_curve,
        ann_srp_lsh,
        ann_srp_multiprobe,
        er_golden_record,
        events_binseg_changepoint,
        stats_bradley_terry,
        stats_dickey_fuller,
        stats_granger_causality,
        stats_kendall_tau,
    )

    out = {"metric": "inference_stress", "repl": args.repl, "sf_base": SF_DIR}
    base = {
        "bradley_terry": timed(lambda: stats_bradley_terry(spark, SF_DIR)),
        "srp_lsh": timed(lambda: ann_srp_lsh(spark, SF_DIR)),
        "golden_record": timed(lambda: er_golden_record(spark, SF_DIR)),
        "binseg": timed(lambda: events_binseg_changepoint(spark, SF_DIR)),
        "srp_multiprobe": timed(lambda: ann_srp_multiprobe(spark, SF_DIR)),
        "srp_band_curve": timed(lambda: ann_srp_band_curve(spark, SF_DIR)),
        "granger": timed(lambda: stats_granger_causality(spark, SF_DIR)),
        "kendall_tau": timed(lambda: stats_kendall_tau(spark, SF_DIR)),
        "dickey_fuller": timed(lambda: stats_dickey_fuller(spark, SF_DIR)),
        "bbit_curve": timed(lambda: dedup_bbit_minhash_curve(spark, SF_DIR)),
        "row_tracking": timed(lambda: row_tracking_lifecycle(spark, SF_DIR)),
    }
    stress_dir = replicate(spark, args.repl)
    big = {
        "bradley_terry": timed(lambda: stats_bradley_terry(spark, stress_dir)),
        "srp_lsh": timed(lambda: ann_srp_lsh(spark, stress_dir)),
        "golden_record": timed(lambda: er_golden_record(spark, stress_dir)),
        "binseg": timed(lambda: events_binseg_changepoint(spark, stress_dir)),
        "srp_multiprobe": timed(lambda: ann_srp_multiprobe(spark, stress_dir)),
        "srp_band_curve": timed(lambda: ann_srp_band_curve(spark, stress_dir)),
        "granger": timed(lambda: stats_granger_causality(spark, stress_dir)),
        "kendall_tau": timed(lambda: stats_kendall_tau(spark, stress_dir)),
        "dickey_fuller": timed(lambda: stats_dickey_fuller(spark, stress_dir)),
        "bbit_curve": timed(lambda: dedup_bbit_minhash_curve(spark, stress_dir)),
        "row_tracking": timed(lambda: row_tracking_lifecycle(spark, stress_dir)),
    }
    out["wall_1x"] = base
    out[f"wall_{args.repl}x"] = big
    out["ratio"] = {
        k: round(big[k] / base[k], 2) if base[k] else None for k in base
    }
    print(json.dumps(out))
    shutil.rmtree(STRESS, ignore_errors=True)


if __name__ == "__main__":
    main()
