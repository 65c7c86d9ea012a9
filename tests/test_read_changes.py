"""First-class Change Data Feed (sources.merge.read_changes): per-commit
classification, bucket-scoped derivation, DV deletes, metadata-op
skipping, and schema posture under renames/adds.

Reference parity note: the reference has no table store (persistence is
Mongoose+Neo4j, src/mongraph.coffee:9-48); this pins §2.7 extension
surface at Delta-CDF semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M


def _history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, i * 10) for i in range(10)], "k long, v long")
    M.init_table(df, root, key="k", n_buckets=4)  # v0
    M.upsert(
        spark,
        root,
        spark.createDataFrame([(3, 999), (20, 1)], "k long, v long"),
        key="k",
    )  # v1: update 3 + insert 20
    M.delete_where(spark, root, F.col("k") == 5)  # v2
    M.add_column(root, "w", "long", 0)  # v3: metadata only
    M.delete_where_dv(spark, root, F.col("k") == 6)  # v4: DV delete
    M.rename_column(root, "v", "val")  # v5: metadata only
    return root


def test_feed_classifies_every_transition(spark, tmp_path):
    root = _history(spark, tmp_path)
    by = {}
    for r in M.read_changes(spark, root, 0).collect():
        by.setdefault((r["_commit_version"], r["_change_type"]), []).append(r)
    assert {k for k in by} == {
        (1, "insert"),
        (1, "update_preimage"),
        (1, "update_postimage"),
        (2, "delete"),
        (4, "delete"),
    }
    assert by[(1, "insert")][0]["k"] == 20
    assert by[(1, "update_preimage")][0]["val"] == 30
    assert by[(1, "update_postimage")][0]["val"] == 999
    assert by[(2, "delete")][0]["k"] == 5
    assert by[(4, "delete")][0]["k"] == 6  # deletion vector surfaces as delete


def test_init_is_pure_inserts_and_range_scoping(spark, tmp_path):
    root = _history(spark, tmp_path)
    full = M.read_changes(spark, root, -1)
    v0 = full.filter("_commit_version = 0")
    assert v0.count() == 10
    assert {r["_change_type"] for r in v0.collect()} == {"insert"}
    assert M.read_changes(spark, root, 1, 2).count() == 1
    assert M.read_changes(spark, root, 2, 3).count() == 0  # metadata only
    with pytest.raises(ValueError, match="beyond"):
        M.read_changes(spark, root, 5, 2)


def test_feed_reads_current_logical_schema(spark, tmp_path):
    root = _history(spark, tmp_path)
    cols = M.read_changes(spark, root, 0).columns
    # renamed column under its new name, added column filled, markers last
    assert cols == ["k", "val", "w", "_change_type", "_commit_version"]


def test_unchanged_upsert_rows_never_appear(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, i) for i in range(8)], "k long, v long")
    M.init_table(df, root, key="k", n_buckets=2)
    # re-upsert identical rows: write-amplified on disk, but the FEED is empty
    M.upsert(spark, root, df, key="k")
    assert M.read_changes(spark, root, 0).count() == 0


def test_requires_keyed_table(spark, tmp_path):
    root = str(tmp_path / "flat")
    M.init_table(spark.range(3).withColumnRenamed("id", "k"), root)
    with pytest.raises(ValueError, match="bucketed"):
        M.read_changes(spark, root, 0)


def test_feed_applies_to_ivm_identity(spark, tmp_path):
    """Applying the feed's signed contributions onto v0 reproduces the
    current version — the IVM consumer contract the streaming twin runs."""
    root = _history(spark, tmp_path)
    feed = M.read_changes(spark, root, 0)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.select(
        sign.alias("s"), (sign * F.col("val")).alias("sv")
    ).agg(F.sum("s").alias("d_rows"), F.sum("sv").alias("d_val")).collect()[0]
    v0 = M.read_version(spark, root, 0)
    cur = M.read_current(spark, root)
    assert v0.count() + delta["d_rows"] == cur.count()
    base = v0.agg(F.sum("val")).collect()[0][0]
    assert base + delta["d_val"] == cur.agg(F.sum("val")).collect()[0][0]
