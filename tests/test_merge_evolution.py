"""MERGE schema evolution (the Delta mergeSchema behavior): a source
carrying new columns auto-adds them through the add_column claim
protocol; interplay pins with reincarnation and the OCC conflict
surface.

Reference parity note: the reference has no table store (persistence is
Mongoose+Neo4j, src/mongraph.coffee:9-48); this pins §2.7 extension
surface at Delta-parity semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M


def _init(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(10)], "k long, name string"
    )
    M.init_table(df, root, key="k", n_buckets=4)
    return root


def test_evolving_merge_adds_column_with_null_fence(spark, tmp_path):
    root = _init(spark, tmp_path)
    src = spark.createDataFrame(
        [(3, "three", 33), (20, "twenty", 200)], "k long, name string, score long"
    )
    M.merge_into(
        spark,
        root,
        src,
        when_matched_set={"name": "src_name", "score": "src_score"},
        schema_evolution=True,
    )
    out = {r["k"]: (r["name"], r["score"]) for r in M.read_current(spark, root).collect()}
    assert out[3] == ("three", 33) and out[20] == ("twenty", 200)
    assert out[5] == ("n5", None)  # pre-existing file reads the NULL fence
    # the evolution rode the standard protocol: add_column version, then merge
    ops = [
        (M._read_commit(root, v) or {}).get("op")
        for v in ("v_00001", "v_00002")
    ]
    assert ops == ["add_column", "merge"]


def test_without_flag_extra_columns_projected_away(spark, tmp_path):
    root = _init(spark, tmp_path)
    src = spark.createDataFrame(
        [(3, "three", 33)], "k long, name string, score long"
    )
    M.merge_into(
        spark, root, src, when_matched_set={"name": "src_name"}
    )  # default: target schema authoritative
    cur = M.read_current(spark, root)
    assert "score" not in cur.columns
    assert cur.filter(F.col("k") == 3).collect()[0]["name"] == "three"


def test_evolving_merge_reincarnates_dropped_name_safely(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(10)], "k long, name string, v long"
    )
    M.init_table(df, root, key="k", n_buckets=4)
    M.drop_column(root, "v")  # tombstoned; old bytes still on disk
    src = spark.createDataFrame([(3, "three", 7)], "k long, name string, v long")
    M.merge_into(
        spark, root, src, when_matched_set={"v": "src_v"}, schema_evolution=True
    )
    out = {r["k"]: r["v"] for r in M.read_current(spark, root).collect()}
    assert out[3] == 7
    assert all(v is None for k, v in out.items() if k != 3)  # no resurrection


def test_evolution_bumps_fingerprint_for_occ(spark, tmp_path):
    """The conflict pin: an in-flight writer whose snapshot predates the
    evolving merge conflicts — rebase via the fingerprint, fail-fast via
    _recheck_meta."""
    root = _init(spark, tmp_path)
    meta_before = M._read_meta(root)
    fp_before = M._meta_fingerprint(meta_before)
    src = spark.createDataFrame([(1, "one", 5)], "k long, name string, score long")
    M.merge_into(spark, root, src, schema_evolution=True)
    assert fp_before != M._meta_fingerprint(M._read_meta(root))
    ver = M._next_version(root)
    with pytest.raises(M.CommitConflict):
        M._recheck_meta(root, ver, meta_before)
    M._release_claim(root, ver)


def test_evolution_composes_with_renames(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "name", "label")
    src = spark.createDataFrame(
        [(2, "two", 9)], "k long, label string, score long"
    )
    M.merge_into(
        spark,
        root,
        src,
        when_matched_set={"label": "src_label", "score": "src_score"},
        schema_evolution=True,
    )
    out = {r["k"]: (r["label"], r["score"]) for r in M.read_current(spark, root).collect()}
    assert out[2] == ("two", 9) and out[4] == ("n4", None)
    # a source column named after a live column's PHYSICAL name is refused
    bad = spark.createDataFrame(
        [(2, "x", 1)], "k long, label string, name long"
    )
    with pytest.raises(ValueError, match="physical"):
        M.merge_into(spark, root, bad, schema_evolution=True)
