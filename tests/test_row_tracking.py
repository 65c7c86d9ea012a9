"""Row-tracking pins for the CoW store: stable ``_row_id`` identity
across updates / compaction / rebucket, version-namespaced minting,
retire-on-delete + new-identity-on-reinsert, hidden-by-default reads,
and the fail-fast-only OCC rule."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M

STRIDE = 1 << 40
CAP = STRIDE // 4  # init's per-bucket id capacity at n_buckets=4
# bucket-major init ids for keys 1..6 under the md5 mint bucket
# (int(md5(str(key))[:8], 16) % 4): buckets ->
# {1: 0, 2: 1, 3: 2, 4: 1, 5: 3, 6: 0}; rank by key in-bucket
INIT_IDS = {1: 1, 2: CAP + 1, 3: 2 * CAP + 1,
            4: CAP + 2, 5: 3 * CAP + 1, 6: 2}


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="mg_rt_")
    shutil.rmtree(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _table(spark, root):
    df = spark.createDataFrame(
        [(i, f"name{i}", i * 10) for i in range(1, 7)],
        "id long, name string, val long",
    )
    M.init_table(df, root, key="id", n_buckets=4, row_tracking=True)


def _ids(spark, root):
    return {
        r["id"]: r["_row_id"]
        for r in M.read_current(spark, root, with_row_ids=True).collect()
    }


def test_init_ids_bucket_major_rank(spark, root):
    # init mints per-bucket (parallel, no global window): v0 epoch +
    # bucket * capacity + rank-of-key within the bucket — unique, stable,
    # and entirely inside v0's id namespace
    _table(spark, root)
    ids = _ids(spark, root)
    assert ids == INIT_IDS
    assert len(set(ids.values())) == 6
    assert all(0 < v < STRIDE for v in ids.values())


def test_update_inherits_insert_mints(spark, root):
    _table(spark, root)
    up = spark.createDataFrame(
        [(2, "NEW2", 222), (10, "n10", 100), (11, "n11", 110)],
        "id long, name string, val long",
    )
    M.upsert(spark, root, up, key="id")
    ids = _ids(spark, root)
    assert ids[2] == INIT_IDS[2]  # inherited
    assert ids[10] == 1 * STRIDE + 1 and ids[11] == 1 * STRIDE + 2
    # the update really happened (inherit did not keep the old row)
    row = {
        r["id"]: r["name"]
        for r in M.read_current(spark, root).collect()
    }
    assert row[2] == "NEW2"


def test_compact_and_rebucket_preserve_ids(spark, root):
    _table(spark, root)
    M.upsert(
        spark,
        root,
        spark.createDataFrame([(10, "x", 1)], "id long, name string, val long"),
        key="id",
    )
    before = _ids(spark, root)
    M.compact(spark, root)
    assert _ids(spark, root) == before
    M.rebucket(spark, root, 8)
    assert _ids(spark, root) == before


def test_delete_retires_reinsert_mints_new(spark, root):
    _table(spark, root)
    M.delete_where(spark, root, F.col("id") == 2)  # v1
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(2, "REBORN", 9)], "id long, name string, val long"
        ),
        key="id",
    )  # v2
    ids = _ids(spark, root)
    assert ids[2] == 2 * STRIDE + 1  # NEW identity, v2 namespace
    # every id still unique
    assert len(set(ids.values())) == len(ids)


def test_merge_into_inherit_and_mint(spark, root):
    _table(spark, root)
    src = spark.createDataFrame(
        [(3, "m3", 1), (20, "m20", 2)], "id long, name string, val long"
    )
    M.merge_into(
        spark,
        root,
        src,
        when_matched_set={"val": "val + src_val"},
        insert_not_matched=True,
    )
    ids = _ids(spark, root)
    assert ids[3] == INIT_IDS[3]  # matched update keeps the target row's id
    assert ids[20] == 1 * STRIDE + 1  # insert minted in v1's namespace
    vals = {r["id"]: r["val"] for r in M.read_current(spark, root).collect()}
    assert vals[3] == 31


def test_default_reader_hides_row_id(spark, root):
    _table(spark, root)
    assert "_row_id" not in M.read_current(spark, root).columns
    assert "_row_id" in M.read_current(spark, root, with_row_ids=True).columns
    assert "_row_id" not in M.read_version(spark, root, 0).columns
    assert "_row_id" in M.read_version(spark, root, 0, with_row_ids=True).columns


def test_rebase_falls_back_to_failfast(spark, root):
    _table(spark, root)
    # a rebase request on a row-tracking table must still commit (ids
    # embed the claim-time version, so the path silently serializes)
    M.upsert(
        spark,
        root,
        spark.createDataFrame([(30, "r", 1)], "id long, name string, val long"),
        key="id",
        occ="rebase",
    )
    ids = _ids(spark, root)
    assert ids[30] == 1 * STRIDE + 1


def test_dv_delete_keeps_other_ids(spark, root):
    _table(spark, root)
    M.delete_where_dv(spark, root, F.col("id") == 4)
    ids = _ids(spark, root)
    assert 4 not in ids
    assert ids[5] == INIT_IDS[5]  # merge-on-read never touched the survivors
    # a later upsert on the same bucket materializes the vector and still
    # preserves every surviving id
    M.upsert(
        spark,
        root,
        spark.createDataFrame([(5, "u", 1)], "id long, name string, val long"),
        key="id",
    )
    assert _ids(spark, root)[5] == INIT_IDS[5]


def test_row_tracking_requires_key(spark, root):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError, match="bucketed"):
        M.init_table(df, root, row_tracking=True)


def test_schema_evolution_keeps_ids(spark, root):
    _table(spark, root)
    M.add_column(root, "score", "double", 0.5)
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(1, "upd", 1, 0.9)], "id long, name string, val long, score double"
        ),
        key="id",
    )
    cur = M.read_current(spark, root, with_row_ids=True)
    rows = {r["id"]: r for r in cur.collect()}
    assert rows[1]["_row_id"] == INIT_IDS[1] and rows[1]["score"] == 0.9
    assert rows[6]["score"] == 0.5  # default fill rides with ids intact
