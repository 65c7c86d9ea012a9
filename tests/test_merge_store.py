"""Copy-on-write parquet MERGE: version pointer, upsert semantics,
last-writer-wins, delete rewrite, reader isolation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mongraph_spark.sources.merge import (
    current_version,
    delete_where,
    init_table,
    read_current,
    upsert,
)


def _base(spark):
    return spark.createDataFrame(
        [(i, f"name{i}", 0) for i in range(100)], "id long, name string, rev long"
    )


def test_upsert_insert_and_replace(spark, tmp_path):
    root = str(tmp_path / "tbl")
    init_table(_base(spark), root)
    updates = spark.createDataFrame(
        [(5, "five-new", 1), (200, "brand-new", 1)], "id long, name string, rev long"
    )
    upsert(spark, root, updates, key="id", order_col="rev")
    cur = read_current(spark, root)
    assert cur.count() == 101
    rows = {r.id: r.name for r in cur.filter(F.col("id").isin(5, 200, 6)).collect()}
    assert rows == {5: "five-new", 200: "brand-new", 6: "name6"}


def test_upsert_last_writer_wins_within_batch(spark, tmp_path):
    root = str(tmp_path / "tbl")
    init_table(_base(spark), root)
    updates = spark.createDataFrame(
        [(7, "older", 1), (7, "newer", 2)], "id long, name string, rev long"
    )
    upsert(spark, root, updates, key="id", order_col="rev")
    got = read_current(spark, root).filter(F.col("id") == 7).collect()
    assert len(got) == 1 and got[0].name == "newer"


def test_versions_advance_and_delete(spark, tmp_path):
    root = str(tmp_path / "tbl")
    assert init_table(_base(spark), root) == "v_00000"
    v1 = upsert(
        spark,
        root,
        spark.createDataFrame([(1, "x", 1)], "id long, name string, rev long"),
        key="id",
        order_col="rev",
    )
    assert v1 == "v_00001" and current_version(root) == "v_00001"
    v2 = delete_where(spark, root, F.col("id") < 50)
    assert v2 == "v_00002"
    cur = read_current(spark, root)
    assert cur.count() == 50 and cur.agg(F.min("id")).first()[0] == 50


def test_reader_pins_version_across_writes(spark, tmp_path):
    """A DataFrame opened before an upsert keeps reading its own version
    (immutable version dirs — no torn reads)."""
    root = str(tmp_path / "tbl")
    init_table(_base(spark), root)
    old_reader = read_current(spark, root)
    upsert(
        spark,
        root,
        spark.createDataFrame([(999, "late", 1)], "id long, name string, rev long"),
        key="id",
        order_col="rev",
    )
    assert old_reader.count() == 100  # still v0
    assert read_current(spark, root).count() == 101
    # both version dirs exist on disk
    assert sorted(d for d in os.listdir(root) if d.startswith("v_")) == [
        "v_00000",
        "v_00001",
    ]


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: only TRUE-predicate rows go; a NULL predicate
    (comparison on a NULL column) must keep the row, not delete it."""
    root = str(tmp_path / "tbl")
    init_table(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 99)], "id long, score long"
        ),
        root,
    )
    delete_where(spark, root, F.col("score") > 50)
    got = sorted(r.id for r in read_current(spark, root).collect())
    assert got == [1, 2]  # id=2 (NULL score) survives; only id=3 deleted


def test_upsert_key_only_updates(spark, tmp_path):
    """A key-only update batch (no tie-break columns) must not raise on the
    empty-struct ordering path."""
    root = str(tmp_path / "tbl")
    init_table(spark.createDataFrame([(1,), (2,)], "id long"), root)
    upsert(
        spark,
        root,
        spark.createDataFrame([(2,), (2,), (3,)], "id long"),
        key="id",
    )
    got = sorted(r.id for r in read_current(spark, root).collect())
    assert got == [1, 2, 3]
