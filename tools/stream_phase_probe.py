"""Per-phase breakdown of streaming_scd2_history / streaming_ivm_agg at
sf0.1 (VERDICT r12 order #3) — replays each op's foreachBatch body with
perf_counter around every phase, COVERAGE §6-style, so the floor
arithmetic is measured rather than argued by reference.

    python tools/stream_phase_probe.py scd2
    python tools/stream_phase_probe.py ivm
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mongraph_spark.sparkutil import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_scd2() -> None:
    from mongraph_spark.queries.quality import ivm_build_history
    from mongraph_spark.sources import merge as merge_store
    from mongraph_spark.streaming.events import _state_partitioning

    spark = get_spark("probe-scd2")
    t0 = time.perf_counter()
    root = ivm_build_history(spark, SF_DIR, tag="shared")
    t_hist = time.perf_counter() - t0
    phases: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def ph(name: str, fn):
        t = time.perf_counter()
        out = fn()
        phases[name] += time.perf_counter() - t
        counts[name] += 1
        return out

    for trial in range(3):
        cur_tab = root + "_scd2cur"
        log_dir = root + "_scd2log"
        for d in (cur_tab, log_dir):
            shutil.rmtree(d, ignore_errors=True)
        trial_t0 = time.perf_counter()

        def process(batch_df: DataFrame, batch_id: int) -> None:
            s = batch_df.sparkSession
            batch_df = ph(
                "1_batch_ckpt", lambda: batch_df.localCheckpoint(eager=True)
            )
            ver = ph(
                "2_ver_collect",
                lambda: batch_df.agg(F.max("_commit_version")).collect()[0][0],
            )
            if ver is None:
                return
            opens = batch_df.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).select(
                "doc_id", "source", "n_chars", F.lit(int(ver)).alias("_valid_from")
            )
            if merge_store.current_version(cur_tab) is not None:
                aff = batch_df.select("doc_id").distinct()

                def close():
                    closing = (
                        merge_store.read_current(s, cur_tab)
                        .drop("__bucket")
                        .join(F.broadcast(aff), "doc_id")
                        .withColumn("_valid_to", F.lit(int(ver)).cast("long"))
                    )
                    closing.write.mode("append").parquet(log_dir)

                ph("3_close_log_append", close)
                dels2 = batch_df.filter(
                    F.col("_change_type") == "delete"
                ).select(
                    "doc_id", "source", "n_chars", F.lit(-1).alias("_valid_from")
                )
                ph(
                    "4_fused_merge",
                    lambda: merge_store.merge_into(
                        s,
                        cur_tab,
                        opens.unionByName(dels2),
                        when_matched_set={
                            "source": "src_source",
                            "n_chars": "src_n_chars",
                            "_valid_from": "src__valid_from",
                        },
                        when_matched_delete="src__valid_from = -1",
                        insert_not_matched=True,
                    ),
                )
            else:
                ph(
                    "0_init_table",
                    lambda: merge_store.init_table(
                        opens, cur_tab, key="doc_id", n_buckets=8
                    ),
                )

        with _state_partitioning(spark, SF_DIR):
            q = (
                merge_store.stream_changes(spark, root, since_version=-1)
                .writeStream.foreachBatch(process)
                .start()
            )
            try:
                t = time.perf_counter()
                q.processAllAvailable()
                phases["7_drain_total"] += time.perf_counter() - t
            finally:
                q.stop()

        t = time.perf_counter()
        cur = (
            merge_store.read_current(spark, cur_tab)
            .drop("__bucket")
            .withColumn("_valid_to", F.lit(None).cast("long"))
        )
        try:
            closed = spark.read.parquet(log_dir).select(*cur.columns)
            dim = closed.unionByName(cur)
        except Exception:
            dim = cur
        dim.groupBy("_valid_from", "_valid_to").agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).write.format("noop").mode("overwrite").save()
        phases["8_final_rollup"] += time.perf_counter() - t
        phases["9_trial_total"] += time.perf_counter() - trial_t0
        counts["9_trial_total"] += 1

    print(json.dumps({"op": "scd2", "hist_build_s": round(t_hist, 2)}))
    for k in sorted(phases):
        print(
            f"  {k}: total {phases[k]:.2f} s over {counts[k]} calls"
            f" (avg/trial {phases[k] / 3:.2f})"
        )


def run_ivm() -> None:
    from mongraph_spark.queries.quality import ivm_build_history
    from mongraph_spark.sources import merge as merge_store
    from mongraph_spark.streaming.events import _state_partitioning

    spark = get_spark("probe-ivm")
    t0 = time.perf_counter()
    root = ivm_build_history(spark, SF_DIR, tag="shared")
    t_hist = time.perf_counter() - t0
    phases: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def ph(name: str, fn):
        t = time.perf_counter()
        out = fn()
        phases[name] += time.perf_counter() - t
        counts[name] += 1
        return out

    for trial in range(3):
        trial_t0 = time.perf_counter()

        def rv(n: int) -> DataFrame:
            return merge_store.read_version(spark, root, n).drop("__bucket")

        v0, v2 = rv(0), rv(2)
        view0 = ph(
            "1_view0_build",
            lambda: v0.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True),
        )
        view_root = root + "_view"
        shutil.rmtree(view_root, ignore_errors=True)
        ph(
            "2_view_init",
            lambda: merge_store.init_table(
                view0, view_root, key="source", n_buckets=4
            ),
        )
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        changes = merge_store.stream_changes(spark, root, since_version=0).select(
            "source",
            sign.cast("long").alias("dc"),
            (sign * F.col("n_chars")).cast("long").alias("dch"),
        )
        dv = changes.groupBy("source").agg(
            F.sum("dc").alias("dd"), F.sum("dch").alias("dsc")
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            def go():
                merged = (
                    batch_df.join(view0, "source", "left")
                    .na.fill(0, ["n_docs", "sum_chars"])
                    .select(
                        "source",
                        (F.col("n_docs") + F.col("dd")).cast("long").alias("n_docs"),
                        (F.col("sum_chars") + F.col("dsc"))
                        .cast("long")
                        .alias("sum_chars"),
                    )
                )
                merge_store.upsert(
                    batch_df.sparkSession, view_root, merged, key="source"
                )

            ph("3_sink_upsert", go)

        with _state_partitioning(spark, SF_DIR):
            q = dv.writeStream.foreachBatch(sink).outputMode("update").start()
            try:
                t = time.perf_counter()
                q.processAllAvailable()
                phases["4_drain_total"] += time.perf_counter() - t
            finally:
                q.stop()

        t = time.perf_counter()
        maintained = (
            merge_store.read_current(spark, view_root)
            .drop("__bucket")
            .select(
                "source",
                F.col("n_docs").alias("n_docs_maintained"),
                F.col("sum_chars").alias("sum_chars_maintained"),
            )
        )
        base = view0.select(
            "source",
            F.col("n_docs").alias("n_docs_v0"),
            F.col("sum_chars").alias("sum_chars_v0"),
        )
        full = v2.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_full"),
            F.sum("n_chars").cast("long").alias("sum_chars_full"),
        )
        base.join(full, "source", "full_outer").join(
            maintained, "source", "left"
        ).write.format("noop").mode("overwrite").save()
        phases["5_final_identity"] += time.perf_counter() - t
        phases["6_trial_total"] += time.perf_counter() - trial_t0
        counts["6_trial_total"] += 1

    print(json.dumps({"op": "ivm", "hist_build_s": round(t_hist, 2)}))
    for k in sorted(phases):
        print(
            f"  {k}: total {phases[k]:.2f} s over {counts[k]} calls"
            f" (avg/trial {phases[k] / 3:.2f})"
        )


if __name__ == "__main__":
    {"scd2": run_scd2, "ivm": run_ivm}[sys.argv[1]]()
