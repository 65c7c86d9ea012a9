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
    # TWO batches are committed before the restart (v0 then v1, one
    # commit per trigger), so the checkpointed offset (1) sits AHEAD of
    # a naive since-seeded rate-limit cursor (whose first advertisement
    # would be since+1 = 0) — the exact shape where a regressed
    # latestOffset would make the engine redeliver v1.
    _base(spark, root)
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(50, "x", 5)], "doc_id long, source string, n_chars long"
        ),
        key="doc_id",
    )  # v1
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
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(seen)
    assert {v for _, _, v in first} == {0, 1}  # two committed batches
    # commits that land while the stream is down
    M.delete_where(spark, root, F.col("doc_id") == 5)  # v2
    M.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(51, "y", 7)], "doc_id long, source string, n_chars long"
        ),
        key="doc_id",
    )  # v3
    # restart from the same checkpoint: only v2 + v3 may arrive
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
    assert {v for _, _, v in sorted(set(seen) - set(first))} == {2, 3}


def test_stop_at_latest_available_now_drains_and_terminates(spark, root):
    # the finite-replay pin (availableNow emulation): stop_at_version=
    # "latest" snapshots the commit-log head at stream start, the query
    # drains exactly to it and STOPS ON ITS OWN under availableNow —
    # no processAllAvailable babysitting.
    _base(spark, root)  # v0
    for i in range(3):  # v1..v3
        M.upsert(
            spark,
            root,
            spark.createDataFrame(
                [(60 + i, f"z{i}", i)],
                "doc_id long, source string, n_chars long",
            ),
            key="doc_id",
        )
    seen: list[tuple] = []

    def sink(b, bid):
        seen.extend(
            (r["doc_id"], r["_change_type"], r["_commit_version"])
            for r in b.collect()
        )

    ckpt = root + "_ckpt"
    q = (
        M.stream_changes(spark, root, stop_at_version="latest")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)  # terminates on its own
    exp = sorted(
        (r["doc_id"], r["_change_type"], r["_commit_version"])
        for r in M.read_changes(spark, root, since_version=-1).collect()
    )
    assert sorted(seen) == exp  # the FULL snapshot, not a paced prefix
    # incremental re-run: new commits only, exactly-once across runs
    M.delete_where(spark, root, F.col("doc_id") == 61)  # v4
    q2 = (
        M.stream_changes(spark, root, stop_at_version="latest")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120)
    exp2 = sorted(
        (r["doc_id"], r["_change_type"], r["_commit_version"])
        for r in M.read_changes(spark, root, since_version=-1).collect()
    )
    assert sorted(seen) == exp2
    assert {v for _, _, v in set(seen) - set(exp)} == {4}


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


def test_direct_format_enforces_same_guards(spark, root):
    # the guards live in the READER, not just the stream_changes wrapper:
    # a bare readStream.format("mongraph_cdf") over a generated-column
    # table must fail at stream construction, never NULL-fill the
    # generated column (partitions() drops expr entries from fills).
    from mongraph_spark.sources.cdf_stream import (
        FORMAT_NAME,
        CdfStreamReader,
    )

    df = spark.createDataFrame([(1, 2)], "doc_id long, n long")
    M.init_table(df, root, key="doc_id", n_buckets=2)
    M.add_generated_column(spark, root, "n2", "long", "n * 2")
    with pytest.raises(NotImplementedError, match="generated"):
        CdfStreamReader({"root": root})
    root2 = root + "_flat"
    try:
        M.init_table(
            spark.createDataFrame([(1, "a")], "doc_id long, source string"),
            root2,
        )  # un-keyed
        with pytest.raises(ValueError, match="bucketed"):
            CdfStreamReader({"root": root2})
    finally:
        shutil.rmtree(root2, ignore_errors=True)
    assert FORMAT_NAME == "mongraph_cdf"  # the public name routes here
