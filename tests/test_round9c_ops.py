"""Round-9 third sweep: CHECK constraints on the CoW store (Delta's
ALTER TABLE ADD CONSTRAINT / InvariantViolationException surface) and the
RESTORE driver query's invariants.

Reference parity: the reference trusts Mongoose schema validation on save
(src/mongraphMongoosePlugin.coffee:10-26); CHECK constraints are the
warehouse form — a declared invariant enforced on every write batch
before any file stages."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mongraph_spark.sources import merge as M


def _tbl(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"n{i}", 10 * i) for i in range(8)], "id long, s string, v long"
    )
    M.init_table(df, root, key="id", n_buckets=4)
    return root


def _no_claims(root):
    return not [f for f in os.listdir(root) if f.endswith(".claim")]


def test_check_constraint_lifecycle(spark, tmp_path):
    """Add → enforce on upsert and merge → NULL passes (SQL three-valued
    CHECK) → alter rejected by existing data → drop re-opens the gate."""
    root = _tbl(spark, tmp_path)
    M.add_check_constraint(spark, root, "v_nonneg", "v >= 0")
    assert M.describe(root)["constraints"] == {"v_nonneg": "v >= 0"}
    # the ALTER committed as an auditable version
    assert M._read_commit(root, "v_00001")["op"] == "add_constraint"

    M.upsert(spark, root, spark.createDataFrame([(8, "x", 1)], "id long, s string, v long"), key="id")
    with pytest.raises(M.ConstraintViolation) as exc:
        M.upsert(spark, root, spark.createDataFrame([(9, "y", -1)], "id long, s string, v long"), key="id")
    assert exc.value.constraint == "v_nonneg"
    # NULL predicate passes — CHECK only rejects on FALSE
    M.upsert(spark, root, spark.createDataFrame([(10, "z", None)], "id long, s string, v long"), key="id")
    with pytest.raises(M.ConstraintViolation):
        M.merge_into(
            spark,
            root,
            spark.createDataFrame([(1, "n1", 0)], "id long, s string, v long"),
            when_matched_set={"v": "v - 999"},
        )
    # ALTER validates existing data first and records nothing on failure
    with pytest.raises(M.ConstraintViolation):
        M.add_check_constraint(spark, root, "v_big", "v > 1000")
    assert "v_big" not in M.describe(root)["constraints"]

    M.drop_check_constraint(root, "v_nonneg")
    assert M.describe(root)["constraints"] == {}
    M.upsert(spark, root, spark.createDataFrame([(9, "y", -1)], "id long, s string, v long"), key="id")
    got = {r.id: r.v for r in M.read_current(spark, root).collect()}
    assert got[9] == -1 and got[10] is None and got[1] == 10
    assert _no_claims(root)


def test_check_constraint_survives_schema_and_layout_commits(spark, tmp_path):
    """add_column / drop_column / compact / rebucket all carry the
    constraint set through their staged metas — a layout or schema commit
    must never silently drop the table's CHECK rules."""
    root = _tbl(spark, tmp_path)
    M.add_check_constraint(spark, root, "v_nonneg", "v >= 0")
    M.add_column(root, "w", "long", 7)
    assert M.describe(root)["constraints"] == {"v_nonneg": "v >= 0"}
    M.drop_column(root, "w")
    assert M.describe(root)["constraints"] == {"v_nonneg": "v >= 0"}
    M.compact(spark, root)
    assert M.describe(root)["constraints"] == {"v_nonneg": "v >= 0"}
    M.rebucket(spark, root, 8)
    assert M.describe(root)["constraints"] == {"v_nonneg": "v >= 0"}
    with pytest.raises(M.ConstraintViolation):
        M.upsert(spark, root, spark.createDataFrame([(9, "y", -1)], "id long, s string, v long"), key="id")


def test_rejected_merge_releases_claim_immediately(spark, tmp_path):
    """merge_into's fail-fast path claims BEFORE the constraint check; a
    rejected merge must release that claim so the very next writer
    commits instead of waiting out CLAIM_TTL_S."""
    root = _tbl(spark, tmp_path)
    M.add_check_constraint(spark, root, "v_nonneg", "v >= 0")
    with pytest.raises(M.ConstraintViolation):
        M.merge_into(
            spark,
            root,
            spark.createDataFrame([(1, "n1", 0)], "id long, s string, v long"),
            when_matched_set={"v": "-5"},
        )
    assert _no_claims(root)
    # immediate follow-up write succeeds without a conflict/wait
    ver = M.upsert(spark, root, spark.createDataFrame([(8, "x", 1)], "id long, s string, v long"), key="id")
    assert ver == "v_00002"


def test_add_constraint_conflicts_inflight_rebase(spark, tmp_path):
    """A rebase writer whose files were validated under the OLD rule set
    must not commit across an intervening add_constraint: the commit is
    whole-table scoped (classify) AND bumps the meta fingerprint — the
    staged rows may violate the new rule."""
    root = _tbl(spark, tmp_path)
    snap = M.current_version(root)
    fp_before = M._meta_fingerprint(M._read_meta(root))
    M.add_check_constraint(spark, root, "v_nonneg", "v >= 0")
    fp_after = M._meta_fingerprint(M._read_meta(root))
    assert fp_before != fp_after
    reason = M._classify_conflict(root, snap, M.current_version(root), {"0"})
    assert reason is not None and "add_constraint" in reason


def test_constraint_on_empty_table_and_validation_scan(spark, tmp_path):
    """Constraints can be declared before the first commit; the existing-
    data validation scan accepts a table whose rows all satisfy the rule
    and enforces from the very first write."""
    root = str(tmp_path / "empty")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "a", 5)], "id long, s string, v long")
    M.init_table(df.limit(0), root, key="id", n_buckets=4)
    M.add_check_constraint(spark, root, "v_nonneg", "v >= 0")
    with pytest.raises(M.ConstraintViolation):
        M.upsert(spark, root, df.withColumn("v", F.lit(-1)), key="id")
    M.upsert(spark, root, df, key="id")
    assert M.read_current(spark, root).count() == 1


def test_store_restore_query_invariants(spark):
    """The registered RESTORE query's own assertions, run at smoke SF:
    doc 2 resurrected, history intact, manifest identity (zero copy)."""
    from mongraph_spark.queries.quality import store_restore

    rows = store_restore(spark, "/root/testdata/sf0.001").collect()
    assert rows, "query returned nothing"
    for r in rows:
        assert r.final_version == 4
        assert r.doc2_rows_at_bad_v2 == 0
        assert r.manifest_identical == 1
