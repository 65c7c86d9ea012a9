"""Scale-stress evidence for the dedup/ANN path (VERDICT r3 #4).

Replicates the sf0.1 ``documents`` table REPL_DOCS× (320k docs at 64×) and
``embeddings`` REPL_VECS× (512k vectors at 256×) into ``.scale_stress/``,
then times ``dedup_clusters`` and ``ann_ivf`` against the replicated dir in
one warm local[32] session, recording wall time, rows scanned, and shuffle
read/write bytes per query from the Spark status REST API.

Replication shape (documents): replicas 0-3 keep the text verbatim — a
realistic ~6% duplicate-heavy web-corpus band where every duplicated doc has
4 copies — while replicas 4+ get a per-replica token appended to every ≥4
letter word, which rewrites most shingles so they are near-dup-unique.  This
keeps LSH candidate generation linear in corpus size (what we are measuring)
instead of turning the whole corpus into one quadratic dup-class (which no
bucketed design survives and no real corpus exhibits).

Usage: python tools/scale_stress.py [--repl-docs 64] [--repl-vecs 256]
Writes a JSON summary line; copy the numbers into COVERAGE.md BENCHNOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

STRESS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_stress")
UI_PORT = 4049


def stress_session() -> SparkSession:
    """get_spark()'s tuning plus the status UI (metrics source)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_stress")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def build_stress_dir(spark: SparkSession, sf_dir: str, repl_docs: int, repl_vecs: int) -> None:
    shutil.rmtree(STRESS_DIR, ignore_errors=True)
    os.makedirs(STRESS_DIR, exist_ok=True)

    if repl_vecs > 0:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        _build_vecs(spark, emb, repl_vecs)
    if repl_docs <= 0:
        return
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    replicas = []
    for i in range(repl_docs):
        r = docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000_000)).alias("doc_id"),
            (
                F.col("text")
                if i < 4
                # rewrite most shingles: tag every >=4-letter word
                else F.regexp_replace("text", r"(\w{4,})", f"$1x{i}")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        replicas.append(r)
    big_docs = replicas[0]
    for r in replicas[1:]:
        big_docs = big_docs.unionByName(r)
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STRESS_DIR, "documents.parquet")
    )

    # embeddings were built above (repl_vecs gate), independent of docs


def build_stress_events(spark: SparkSession, sf_dir: str, repl_events: int) -> None:
    """Replicate events repl_events× with shifted user/event ids (sequences
    stay per-user bounded — the skew profile of a bigger fleet, not a
    hotter user).  The source file is TIMESTAMP(NANOS); rewrite ts to
    microsecond timestamps so the replica reads under any session."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if dict(ev.dtypes)["ts"] == "bigint"
        else F.col("ts")
    )
    replicas = []
    for i in range(repl_events):
        replicas.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 1_000_000_000_000)).alias("event_id"),
                ts_col.alias("ts"),
                (F.col("user_id") + F.lit(i * 1_000_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STRESS_DIR, "events.parquet")
    )


def build_stress_relational(spark: SparkSession, sf_dir: str, repl: int) -> None:
    """Replicate orders+lineitem repl× with shifted order/customer/supplier
    keys — the purchase graph becomes repl disjoint copies (a bigger
    *fleet*, same per-component topology), which is the honest scale test
    for the landmark graph ops: the K landmarks stay fixed while the
    adjacency they must traverse grows repl×."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    date_cols = {c: t for c, t in orders.dtypes}
    o_date = (
        F.timestamp_micros(F.expr("o_orderdate div 1000"))
        if date_cols.get("o_orderdate") == "bigint"
        else F.col("o_orderdate")
    )
    o_reps, l_reps = [], []
    for i in range(repl):
        o_reps.append(
            orders.select(
                (F.col("o_orderkey") + F.lit(i * 1_000_000_000_000)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(i * 1_000_000_000)).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                o_date.alias("o_orderdate"),
                "o_orderpriority",
            )
        )
        l_reps.append(
            lineitem.select(
                (F.col("l_orderkey") + F.lit(i * 1_000_000_000_000)).alias("l_orderkey"),
                "l_partkey",
                (F.col("l_suppkey") + F.lit(i * 1_000_000_000)).alias("l_suppkey"),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            )
        )
    big_o, big_l = o_reps[0], l_reps[0]
    for r in o_reps[1:]:
        big_o = big_o.unionByName(r)
    for r in l_reps[1:]:
        big_l = big_l.unionByName(r)
    big_o.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STRESS_DIR, "orders.parquet")
    )
    big_l.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STRESS_DIR, "lineitem.parquet")
    )
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    c_reps = [
        customer.select(
            (F.col("c_custkey") + F.lit(i * 1_000_000_000)).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        for i in range(repl)
    ]
    big_c = c_reps[0]
    for r in c_reps[1:]:
        big_c = big_c.unionByName(r)
    big_c.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STRESS_DIR, "customer.parquet")
    )


def _build_vecs(spark: SparkSession, emb, repl_vecs: int) -> None:
    vec_replicas = []
    for i in range(repl_vecs):
        # Shift each replica by a constant offset in the HEAD dims so the
        # embedding SPACE grows with the corpus (identical replicas
        # collapse any K ∝ corpus clustering to K distinct points — the
        # r8 semdedup scaled-K run measured Σ|c|² unchanged at 16×
        # because all 256 seeds coincided pairwise).  Only dims the
        # planted-copy rule KEEPS are shifted (semdedup's copies zero the
        # last ZERO_TAIL dims — a tail shift would push every replica's
        # copies away from their originals and silently destroy the
        # planted recall the stress is supposed to hold fixed).
        from mongraph_spark.queries.dedup import ZERO_TAIL

        n_dims = F.size("embedding")
        off = float(i) * 0.75
        vec_replicas.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda v, j: F.when(
                        j < n_dims - ZERO_TAIL, (v + F.lit(off)).cast("float")
                    ).otherwise(v),
                ).alias("embedding"),
                "label",
            )
        )
    big_emb = vec_replicas[0]
    for r in vec_replicas[1:]:
        big_emb = big_emb.unionByName(r)
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STRESS_DIR, "embeddings.parquet")
    )


def _stage_totals() -> dict[str, int]:
    """Sum input/shuffle bytes over all completed stages (REST status API)."""
    apps = json.load(
        urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    tot = {"input_bytes": 0, "input_records": 0, "shuffle_read_bytes": 0, "shuffle_write_bytes": 0}
    for s in stages:
        tot["input_bytes"] += s.get("inputBytes", 0)
        tot["input_records"] += s.get("inputRecords", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
    return tot


def measure(name: str, fn) -> dict:
    before = _stage_totals()
    t0 = time.perf_counter()
    n_rows = fn().count()
    wall = time.perf_counter() - t0
    after = _stage_totals()
    delta = {k: after[k] - before[k] for k in before}
    rec = {"query": name, "wall_sec": round(wall, 2), "result_rows": n_rows, **delta}
    print("STRESS " + json.dumps(rec), flush=True)
    return rec


def _registry() -> dict:
    """Stressable queries: name -> (callable, needs_embeddings)."""
    from mongraph_spark.queries.corpus import common_token_ratio
    from mongraph_spark.queries.pipeline import dedup_clusters
    from mongraph_spark.queries.search import text_tfidf_topterms
    from mongraph_spark.queries.similarity import ann_ivf
    from mongraph_spark.queries.text import text_collocations, text_winnowing

    from mongraph_spark.queries.corpus import corpus_bigram_xent
    from mongraph_spark.queries.events import (
        events_markov_transitions,
        events_multitouch_attribution,
    )

    from mongraph_spark.queries.corpus import boilerplate_lines
    from mongraph_spark.queries.dedup import dedup_prefix_filter
    from mongraph_spark.queries.events import events_activity_streaks
    from mongraph_spark.queries.relational import sketch_hll_mergeable

    from mongraph_spark.queries.corpus import corpus_heaps_law, corpus_ngram_novelty
    from mongraph_spark.queries.events import events_seasonal_anomaly
    from mongraph_spark.queries.graph_analytics import graph_betweenness_landmarks
    from mongraph_spark.queries.pipeline import pipeline_length_batches
    from mongraph_spark.queries.similarity import (
        embedding_pca_power,
        embedding_pq_codebooks,
    )

    from mongraph_spark.queries.events import (
        events_burstiness,
        events_markov_surprise,
        events_session_cooccurrence,
        events_slo_burn_rate,
        events_user_gini,
    )
    from mongraph_spark.queries.relational import (
        band_join_close_prices,
        customer_rfm_segments,
        ivm_join_delta,
        stats_chi2_independence,
        stats_ks_test,
    )

    from mongraph_spark.queries.multimodal import mm_shard_packing, mm_tar_index
    from mongraph_spark.queries.pipeline import pipeline_curation_funnel

    from mongraph_spark.queries.corpus import corpus_dsir_weights
    from mongraph_spark.queries.dedup import dedup_semdedup
    from mongraph_spark.queries.similarity import ann_matryoshka_curve
    from mongraph_spark.queries.text import text_bpe_train

    from mongraph_spark.queries.corpus import corpus_ccnet_buckets
    from mongraph_spark.queries.dedup import corpus_semantic_decon
    from mongraph_spark.queries.pipeline import corpus_cluster_split

    def _semdedup_scaled_k(spark, sf_dir):
        # K ∝ corpus: 16 seeds per replica band (ids 10..160 + i·1e9) → 256
        # cells at 16× vectors, holding |c| ≈ the 1× regime.  The contrast
        # with the fixed-K row IS the Σ|c|² cost model's demonstration.
        from mongraph_spark.queries.dedup import semdedup_report

        seeds = [
            10 * (j + 1) + i * 1_000_000_000 for i in range(16) for j in range(16)
        ]
        return semdedup_report(spark, sf_dir, seeds)

    def _semdedup_hier(spark, sf_dir):
        # IVF-style coarse->fine training: ONE coarse seed per replica band
        # (K1 = 16) + 16 fine cells per coarse cell = the same 256
        # effective cells as the flat scaled-K row, at O(N*32*d) assignment
        # flops instead of O(N*256*d)
        from mongraph_spark.queries.dedup import semdedup_hier_report

        coarse = [10 + i * 1_000_000_000 for i in range(16)]
        return semdedup_hier_report(spark, sf_dir, coarse, sub_k=16)

    return {
        "dedup_semdedup_hier": (_semdedup_hier, True),
        "corpus_ccnet_buckets": (corpus_ccnet_buckets, False),
        "corpus_cluster_split": (corpus_cluster_split, False),
        "corpus_semantic_decon": (corpus_semantic_decon, True),
        "text_bpe_train": (text_bpe_train, False),
        "dedup_semdedup": (dedup_semdedup, True),
        "dedup_semdedup_scaledK": (_semdedup_scaled_k, True),
        "corpus_dsir_weights": (corpus_dsir_weights, False),
        "ann_matryoshka_curve": (ann_matryoshka_curve, True),
        "pipeline_curation_funnel": (pipeline_curation_funnel, False),
        "mm_shard_packing": (mm_shard_packing, False),
        "mm_tar_index": (mm_tar_index, False),
        "events_user_gini": (events_user_gini, False),
        "events_burstiness": (events_burstiness, False),
        "events_markov_surprise": (events_markov_surprise, False),
        "events_slo_burn_rate": (events_slo_burn_rate, False),
        "events_session_cooccurrence": (events_session_cooccurrence, False),
        "band_join_close_prices": (band_join_close_prices, False),
        "ivm_join_delta": (ivm_join_delta, False),
        "stats_ks_test": (stats_ks_test, False),
        "customer_rfm_segments": (customer_rfm_segments, False),
        "stats_chi2_independence": (stats_chi2_independence, False),
        "corpus_ngram_novelty": (corpus_ngram_novelty, False),
        "corpus_heaps_law": (corpus_heaps_law, False),
        "pipeline_length_batches": (pipeline_length_batches, False),
        "embedding_pca_power": (embedding_pca_power, True),
        "embedding_pq_codebooks": (embedding_pq_codebooks, True),
        "events_seasonal_anomaly": (events_seasonal_anomaly, False),
        "graph_betweenness_landmarks": (graph_betweenness_landmarks, False),
        "dedup_clusters": (dedup_clusters, False),
        "corpus_boilerplate_lines": (boilerplate_lines, False),
        "dedup_prefix_filter": (dedup_prefix_filter, False),
        "ann_ivf": (ann_ivf, True),
        "text_winnowing": (text_winnowing, False),
        "text_tfidf_topterms": (text_tfidf_topterms, False),
        "text_collocations": (text_collocations, False),
        "corpus_common_token_ratio": (common_token_ratio, False),
        "corpus_bigram_xent": (corpus_bigram_xent, False),
        # events-backed (need --repl-events > 0)
        "events_markov_transitions": (events_markov_transitions, False),
        "events_multitouch_attribution": (events_multitouch_attribution, False),
        "events_activity_streaks": (events_activity_streaks, False),
        "sketch_hll_mergeable": (sketch_hll_mergeable, False),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl-docs", type=int, default=64)
    ap.add_argument("--repl-vecs", type=int, default=256)
    ap.add_argument("--repl-events", type=int, default=0)
    ap.add_argument("--repl-rel", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--queries",
        default="dedup_clusters,ann_ivf",
        help="comma-separated subset of: " + ",".join(_registry()),
    )
    args = ap.parse_args()

    reg = _registry()
    picked = [q.strip() for q in args.queries.split(",") if q.strip()]
    unknown = [q for q in picked if q not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {list(reg)}")
    # embeddings replication is the expensive half of the build — skip it
    # when no picked query reads the embeddings table
    repl_vecs = args.repl_vecs if any(reg[q][1] for q in picked) else 0

    spark = stress_session()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()
    build_stress_dir(spark, args.sf_dir, args.repl_docs, repl_vecs)
    if args.repl_events > 0:
        build_stress_events(spark, args.sf_dir, args.repl_events)
    if args.repl_rel > 0:
        build_stress_relational(spark, args.sf_dir, args.repl_rel)
    print(f"STRESS build {time.perf_counter() - t0:.1f}s", flush=True)

    results = [
        measure(name, lambda fn=reg[name][0]: fn(spark, STRESS_DIR)) for name in picked
    ]
    print(
        "STRESS_SUMMARY "
        + json.dumps(
            {
                "repl_docs": args.repl_docs,
                "repl_vecs": args.repl_vecs,
                "results": results,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
