"""RENAME COLUMN via name-mapped column mapping: metadata-only re-label,
physical names stable forever, full interplay with the rest of the store
(key rename, deletion vectors, compact, time travel, restore, clone,
constraints/generated refusals, OCC conflict posture).

Reference parity note: the reference has no table store at all (its
persistence is Mongoose+Neo4j, src/mongraph.coffee:9-48); this suite pins
the §2.7 extension surface at Delta-parity semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M


def _base(spark):
    return spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(20)], "k long, name string, v long"
    )


def _init(spark, tmp_path, name="tbl"):
    root = str(tmp_path / name)
    M.init_table(_base(spark), root, key="k", n_buckets=4)
    return root


def test_rename_preserves_data_and_is_metadata_only(spark, tmp_path):
    root = _init(spark, tmp_path)
    files_before = sorted(
        str(p) for p in (tmp_path / "tbl").rglob("*.parquet")
    )
    M.rename_column(root, "v", "val")
    files_after = sorted(str(p) for p in (tmp_path / "tbl").rglob("*.parquet"))
    assert files_before == files_after  # zero data files touched
    out = M.read_current(spark, root).orderBy("k").collect()
    assert [r["val"] for r in out] == [i * 10 for i in range(20)]
    assert "v" not in M.read_current(spark, root).columns
    # committed as a version with a whole-table write set, like add_column
    rec = M._read_commit(root, M.current_version(root))
    assert rec["op"] == "rename_column" and rec["buckets"] == "*"


def test_writes_through_rename_mix_old_and_new_files(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "v", "val")
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(5, "x5", 999), (100, "new", 1000)], "k long, name string, val long"
        ),
        key="k",
    )
    out = {r["k"]: r["val"] for r in M.read_current(spark, root).collect()}
    assert out[5] == 999 and out[100] == 1000 and out[7] == 70
    # new files physically carry the ORIGINAL (physical) name
    newest = sorted((tmp_path / "tbl").rglob("v_00002/**/*.parquet"))
    assert newest, "upsert wrote no files"
    raw = spark.read.parquet(str(newest[0].parent))
    assert "v" in raw.columns and "val" not in raw.columns


def test_key_rename_point_read_dv_and_merge(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "k", "id")
    assert M._read_meta(root)["key"] == "id"
    assert M.read_point(spark, root, 5).collect()[0]["v"] == 50
    # deletion vectors write/read the key under its physical name
    M.delete_where_dv(spark, root, F.col("id") == 7)
    ids = {r["id"] for r in M.read_current(spark, root).collect()}
    assert 7 not in ids and 6 in ids
    M.merge_into(
        spark,
        root,
        spark.createDataFrame([(6, "six", 1)], "id long, name string, v long"),
        when_matched_set={"v": "v + src_v"},
    )
    out = {r["id"]: r["v"] for r in M.read_current(spark, root).collect()}
    assert out[6] == 61
    # a later compact materializes everything and content is preserved
    M.compact(spark, root, max_files_per_bucket=1)
    assert {
        r["id"]: r["v"] for r in M.read_current(spark, root).collect()
    } == out


def test_chain_collapses_and_rename_back_erases_entry(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "v", "a")
    M.rename_column(root, "a", "b")
    assert M._read_meta(root)["renames"] == {"b": "v"}  # chain -> origin
    M.rename_column(root, "b", "v")
    assert "renames" not in M._read_meta(root)  # identity mapping erased
    out = M.read_current(spark, root).orderBy("k").collect()
    assert [r["v"] for r in out] == [i * 10 for i in range(20)]


def test_swap_via_temporary_name(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "v", "tmp")
    M.rename_column(root, "name", "v")
    M.rename_column(root, "tmp", "name")
    row = M.read_current(spark, root).filter(F.col("k") == 3).collect()[0]
    assert row["v"] == "n3" and row["name"] == 30  # columns swapped, data intact


def test_refusals(spark, tmp_path):
    root = _init(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        M.rename_column(root, "v", "name")
    with pytest.raises(ValueError, match="no column"):
        M.rename_column(root, "zzz", "w")
    with pytest.raises(ValueError, match="reserved"):
        M.rename_column(root, "v", "__bucket")
    M.drop_column(root, "name")
    with pytest.raises(ValueError, match="tombstoned"):
        M.rename_column(root, "v", "name")
    M.add_check_constraint(spark, root, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="referenced"):
        M.rename_column(root, "v", "w")


def test_generated_column_reference_refused_but_self_rename_ok(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.add_generated_column(spark, root, "v2", "long", "v * 2")
    with pytest.raises(ValueError, match="referenced"):
        M.rename_column(root, "v", "w")  # v is referenced by v2's expr
    M.rename_column(root, "v2", "double_v")  # the generated col itself moves
    out = M.read_current(spark, root).filter(F.col("k") == 4).collect()[0]
    assert out["double_v"] == 80
    # writes still compute/validate the generated column under the new name
    M.upsert(
        spark,
        root,
        spark.createDataFrame([(50, "g", 7)], "k long, name string, v long"),
        key="k",
    )
    got = M.read_current(spark, root).filter(F.col("k") == 50).collect()[0]
    assert got["double_v"] == 14


def test_physical_namespace_collision_refused_on_add(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "v", "val")
    with pytest.raises(ValueError, match="physical"):
        M.add_column(root, "v", "long", 0)
    with pytest.raises(ValueError, match="physical"):
        M.add_generated_column(spark, root, "v", "long", "val + 1")


def test_drop_renamed_column_then_reincarnate_old_logical(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "v", "val")
    M.drop_column(root, "val")
    assert "renames" not in M._read_meta(root)  # mapping died with the column
    M.add_column(root, "val", "long", -1)
    out = {r["k"]: r["val"] for r in M.read_current(spark, root).collect()}
    assert all(x == -1 for x in out.values())  # fill, never the old bytes


def test_restore_and_time_travel_read_current_logical_names(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.upsert(
        spark,
        root,
        spark.createDataFrame([(1, "one", 111)], "k long, name string, v long"),
        key="k",
    )
    M.rename_column(root, "v", "val")
    # time travel to the pre-rename version still reads logical (current) names
    v1 = M.read_version(spark, root, 1)
    assert set(v1.columns) == {"k", "name", "val"}
    assert v1.filter(F.col("k") == 1).collect()[0]["val"] == 111
    M.restore(root, version=1)
    cur = M.read_current(spark, root)
    assert set(cur.columns) == {"k", "name", "val"}
    assert cur.filter(F.col("k") == 1).collect()[0]["val"] == 111


def test_shallow_clone_carries_mapping_and_diverges(spark, tmp_path):
    root = _init(spark, tmp_path)
    M.rename_column(root, "v", "val")
    clone = str(tmp_path / "clone")
    M.shallow_clone(root, clone)
    assert M._read_meta(clone)["renames"] == {"val": "v"}
    out = {r["k"]: r["val"] for r in M.read_current(spark, clone).collect()}
    assert out[3] == 30
    # clone evolves independently, writing physical names of its own
    M.upsert(
        spark,
        clone,
        spark.createDataFrame([(3, "c", -3)], "k long, name string, val long"),
        key="k",
    )
    assert (
        M.read_current(spark, clone).filter(F.col("k") == 3).collect()[0]["val"]
        == -3
    )
    assert (
        M.read_current(spark, root).filter(F.col("k") == 3).collect()[0]["val"]
        == 30
    )  # source untouched


def test_read_where_skipping_survives_rename(spark, tmp_path):
    root = _init(spark, tmp_path)
    for i in range(3):  # fragment the buckets so compact has work
        M.upsert(
            spark,
            root,
            spark.createDataFrame(
                [(i + 30, f"f{i}", i)], "k long, name string, v long"
            ),
            key="k",
        )
    M.compact(spark, root, max_files_per_bucket=1, cluster_by="v")
    M.rename_column(root, "v", "val")
    got = M.read_where(spark, root, "val", 40, 90)
    want = (
        M.read_current(spark, root)
        .filter((F.col("val") >= 40) & (F.col("val") <= 90))
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )


def test_rename_conflicts_inflight_rebase_writer(spark, tmp_path):
    root = _init(spark, tmp_path)
    # stage a rebase upsert against the pre-rename snapshot by hand:
    # fingerprint recorded now, rename lands, commit must conflict
    meta = M._read_meta(root)
    fp = M._meta_fingerprint(meta)
    M.rename_column(root, "v", "val")
    assert fp != M._meta_fingerprint(M._read_meta(root))  # renames in the fp


def test_failfast_recheck_conflicts_on_midgap_meta_change(spark, tmp_path):
    root = _init(spark, tmp_path)
    meta = M._read_meta(root)  # the writer's pre-claim meta read
    M.rename_column(root, "v", "val")  # lands in the read-meta-to-claim gap
    ver = M._next_version(root)
    with pytest.raises(M.CommitConflict):
        M._recheck_meta(root, ver, meta)
    # the claim was released by the conflict: the next claim succeeds
    assert M._next_version(root) == ver
    M._release_claim(root, ver)


def test_failfast_recheck_covers_constraint_adds_too(spark, tmp_path):
    """The ADVICE r9 race: add_check_constraint between a fail-fast
    writer's meta read and its claim must conflict the writer (its batch
    was validated under the stale rule set)."""
    root = _init(spark, tmp_path)
    meta = M._read_meta(root)
    M.add_check_constraint(spark, root, "v_pos", "v >= 0")
    ver = M._next_version(root)
    with pytest.raises(M.CommitConflict):
        M._recheck_meta(root, ver, meta)
    M._release_claim(root, ver)
