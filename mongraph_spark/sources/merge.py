"""Copy-on-write MERGE for parquet-backed collections: the distributed
analog of the reference's per-document save/remove write path
(extendDocument.coffee pre-save/pre-remove hooks), re-expressed as bulk
operators over immutable table versions.

Plain parquet has no transactional MERGE, so each mutation writes a NEW
version directory and flips a pointer file — the Delta/Iceberg
copy-on-write model in miniature:

    <root>/v_00000/part-*.parquet
    <root>/v_00001/part-*.parquet
    <root>/_CURRENT            # contains "v_00001"

- ``upsert``: base ANTI-JOIN update-keys  ∪  deduped updates → next version.
  The anti-join is keyed on the row key (broadcast when the update batch is
  small — the common case: a trickle of saves against a huge base).
- ``delete_where``: predicate filter → next version (predicate pushdown
  applies — deleted rows are never shuffled, just not rewritten).
- Readers pin a version at open time (the pointer flip is atomic via
  os.replace), so a long scan never sees a half-written version.

At real scale the rewrite would be partition-scoped (only partitions
containing touched keys are rewritten — requires the key to be the
partition/bucket column); the full-rewrite here is the semantics reference
for that optimization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


def _version_name(n: int) -> str:
    return f"v_{n:05d}"


def current_version(root: str) -> str | None:
    try:
        with open(os.path.join(root, _POINTER)) as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def _next_version(root: str) -> str:
    cur = current_version(root)
    return _version_name(0 if cur is None else int(cur.split("_")[1]) + 1)


def _flip(root: str, version: str) -> None:
    tmp = os.path.join(root, _POINTER + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(root, _POINTER))  # atomic pointer swap


def read_current(spark: SparkSession, root: str) -> DataFrame | None:
    ver = current_version(root)
    if ver is None:
        return None
    return spark.read.parquet(os.path.join(root, ver))


def read_version(spark: SparkSession, root: str, n: int) -> DataFrame:
    """Time-travel read: pin an explicit version instead of the _CURRENT
    pointer.  Versions are immutable once the pointer has moved past them,
    so this is safe concurrently with later upserts — the Delta/Iceberg
    ``VERSION AS OF`` shape."""
    return spark.read.parquet(os.path.join(root, _version_name(n)))


def init_table(df: DataFrame, root: str) -> str:
    """Create version 0 from a DataFrame."""
    os.makedirs(root, exist_ok=True)
    ver = _next_version(root)
    df.write.mode("errorifexists").parquet(os.path.join(root, ver))
    _flip(root, ver)
    return ver


def upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str = "_id",
    order_col: str | None = None,
) -> str:
    """MERGE ``updates`` into the current version (insert-or-replace by
    ``key``); returns the new version name.

    Duplicate keys *within* the update batch resolve to the last writer:
    highest ``order_col`` if given, else an arbitrary-but-deterministic
    max over the remaining columns (mirrors the reference's last-save-wins
    document semantics; a key-only frame needs no tie-break at all)."""
    non_key = [c for c in updates.columns if c != key]
    if order_col is not None:
        order = F.desc(order_col)
    elif non_key:
        order = F.desc(F.struct(*non_key))
    else:
        order = F.asc(key)  # key-only rows are identical; any order dedupes
    w = Window.partitionBy(key).orderBy(order)
    deduped = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    base = read_current(spark, root)
    if base is None:
        merged = deduped
    else:
        keys = deduped.select(key)
        # The common case is a trickle of saves against a huge base, where
        # broadcasting the key set skips shuffling the base entirely.  A big
        # batch must NOT be forced driver-side, so the hint is size-gated;
        # above the threshold AQE picks the strategy from runtime stats.
        n_updates = keys.count()
        if n_updates <= 1_000_000:
            keys = F.broadcast(keys)
        survivors = base.join(keys, key, "left_anti")
        merged = survivors.unionByName(deduped)
    ver = _next_version(root)
    merged.write.mode("errorifexists").parquet(os.path.join(root, ver))
    _flip(root, ver)
    return ver


def delete_where(spark: SparkSession, root: str, condition) -> str:
    """Delete rows matching ``condition`` (a Column) by rewriting the
    survivors into the next version.

    SQL DELETE semantics: only rows where the predicate is TRUE are removed.
    A bare ``filter(~condition)`` would also drop NULL-predicate rows (e.g. a
    comparison against a NULL column), so NULL is coalesced to "keep"."""
    base = read_current(spark, root)
    if base is None:
        raise ValueError(f"no current version under {root}")
    ver = _next_version(root)
    base.filter(~F.coalesce(condition, F.lit(False))).write.mode("errorifexists").parquet(
        os.path.join(root, ver)
    )
    _flip(root, ver)
    return ver
