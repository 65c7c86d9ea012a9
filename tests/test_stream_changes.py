"""Pins for the streaming Change Data Feed (sources/cdf_stream.py +
merge.stream_changes): commit-granular micro-batches in commit order,
row-for-row equality with the batch feed, rate-limit honoring, DV
deletes surfacing as plain deletes, added-column fills, and the
unsupported-shape errors."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="mg_cdfstream_")
    shutil.rmtree(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(d + "_ckpt", ignore_errors=True)


def _base(spark, root):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", i * 10) for i in range(1, 9)],
        "doc_id long, source string, n_chars long",
    )
    M.init_table(df, root, key="doc_id", n_buckets=4)  # v0


def _drain(spark, root, since=-1, per_trigger=1):
    batches = []

    def sink(b, bid):
        batches.append(
            sorted(
                (r["doc_id"], r["_change_type"], r["_commit_version"])
                for r in b.collect()
            )
        )

    q = (
        M.stream_changes(
            spark, root, since_version=since, commits_per_trigger=per_trigger
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", root + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return [b for b in batches if b]


def test_stream_matches_batch_feed_one_commit_per_batch(spark, root):
    _base(spark, root)
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(2, "s9", 999), (100, "sN", 5)],
            "doc_id long, source string, n_chars long",
        ),
        key="doc_id",
    )  # v1
    M.delete_where(spark, root, F.col("doc_id") == 3)  # v2
    batches = _drain(spark, root)
    exp = sorted(
        (r["doc_id"], r["_change_type"], r["_commit_version"])
        for r in M.read_changes(spark, root, since_version=-1).collect()
    )
    got = sorted(x for b in batches for x in b)
    assert got == exp
    # one commit per micro-batch, delivered in commit order
    per_batch_vers = [sorted({v for _, _, v in b}) for b in batches]
    assert all(len(vs) == 1 for vs in per_batch_vers)
    assert [vs[0] for vs in per_batch_vers] == sorted(
        vs[0] for vs in per_batch_vers
    )


def test_commits_per_trigger_bounds_batch_span(spark, root):
    _base(spark, root)
    for i in range(3):  # v1..v3
        M.upsert(
            spark,
            root,
            spark.createDataFrame(
                [(1, f"u{i}", i)], "doc_id long, source string, n_chars long"
            ),
            key="doc_id",
        )
    batches = _drain(spark, root, per_trigger=2)
    assert all(len({v for _, _, v in b}) <= 2 for b in batches)
    got = sorted(x for b in batches for x in b)
    exp = sorted(
        (r["doc_id"], r["_change_type"], r["_commit_version"])
        for r in M.read_changes(spark, root, since_version=-1).collect()
    )
    assert got == exp


def test_dv_delete_surfaces_as_plain_delete(spark, root):
    _base(spark, root)
    M.delete_where_dv(spark, root, F.col("doc_id") == 4)  # v1, merge-on-read
    batches = _drain(spark, root, since=0)
    flat = [x for b in batches for x in b]
    assert flat == [(4, "delete", 1)]


def test_added_column_default_fills(spark, root):
    _base(spark, root)
    M.add_column(root, "score", "double", 0.5)  # v1, metadata-only
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(1, "upd", 11, 0.9)],
            "doc_id long, source string, n_chars long, score double",
        ),
        key="doc_id",
    )  # v2
    q = M.stream_changes(spark, root, since_version=1)
    rows = []

    def sink(b, bid):
        rows.extend(b.collect())

    sq = (
        q.writeStream.foreachBatch(sink)
        .option("checkpointLocation", root + "_ckpt")
        .start()
    )
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    by = {(r["doc_id"], r["_change_type"]): r for r in rows}
    # the pre-image predates the column: reads as the recorded default
    assert by[(1, "update_preimage")]["score"] == 0.5
    assert by[(1, "update_postimage")]["score"] == 0.9


def test_checkpoint_restart_resumes_exactly_once(spark, root):
    # offsets are commit versions persisted in the engine checkpoint: a
    # stopped stream must resume at the next commit, never redeliver.
    # (availableNow snapshots ONE rate-limited latestOffset on this
    # source — see cdf_stream docstring — which here is exactly the
    # "process one commit then stop" half of the scenario.)
    _base(spark, root)
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(50, "x", 5)], "doc_id long, source string, n_chars long"
        ),
        key="doc_id",
    )  # v1
    M.delete_where(spark, root, F.col("doc_id") == 5)  # v2
    seen: list[tuple] = []

    def sink(b, bid):
        seen.extend(
            (r["doc_id"], r["_change_type"], r["_commit_version"])
            for r in b.collect()
        )

    ckpt = root + "_ckpt"
    q = (
        M.stream_changes(spark, root, since_version=-1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first = sorted(seen)
    assert {v for _, _, v in first} == {0}  # exactly the init commit
    # restart from the same checkpoint: only v1 + v2 may arrive
    q2 = (
        M.stream_changes(spark, root, since_version=-1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    exp = sorted(
        (r["doc_id"], r["_change_type"], r["_commit_version"])
        for r in M.read_changes(spark, root, since_version=-1).collect()
    )
    assert sorted(seen) == exp  # union is exactly-once, no redelivery
    assert {v for _, _, v in sorted(set(seen) - set(first))} == {1, 2}


def test_rename_column_feeds_logical_names(spark, root):
    # files written before AND after a rename speak the physical name;
    # the stream must alias to the CURRENT logical schema, exactly like
    # the batch feed
    _base(spark, root)
    M.rename_column(root, "n_chars", "len_chars")  # v1, metadata-only
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(2, "upd", 777)], "doc_id long, source string, len_chars long"
        ),
        key="doc_id",
    )  # v2
    rows = []

    def sink(b, bid):
        assert "len_chars" in b.columns and "n_chars" not in b.columns
        rows.extend(b.collect())

    q = (
        M.stream_changes(spark, root, since_version=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", root + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    by = {(r["doc_id"], r["_change_type"]): r for r in rows}
    assert by[(2, "update_preimage")]["len_chars"] == 20
    assert by[(2, "update_postimage")]["len_chars"] == 777


def test_unsupported_shapes_raise(spark, root):
    flat = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    M.init_table(flat, root)  # un-keyed
    with pytest.raises(ValueError, match="bucketed"):
        M.stream_changes(spark, root)
    root2 = root + "_gen"
    try:
        df = spark.createDataFrame([(1, 2)], "doc_id long, n long")
        M.init_table(df, root2, key="doc_id", n_buckets=2)
        M.add_generated_column(spark, root2, "n2", "long", "n * 2")
        with pytest.raises(NotImplementedError, match="generated"):
            M.stream_changes(spark, root2)
    finally:
        shutil.rmtree(root2, ignore_errors=True)
