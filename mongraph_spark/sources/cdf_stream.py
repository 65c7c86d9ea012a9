"""Streaming Change Data Feed for the CoW store — a first-class PySpark
Python data source (``pyspark.sql.datasource``), the streaming twin of
:func:`mongraph_spark.sources.merge.read_changes`.

``spark.readStream.format("mongraph_cdf")`` with options ``root``,
``since_version`` and ``commits_per_trigger`` yields the same rows as the
batch CDF — the table's columns plus ``_change_type`` / ``_commit_version``
— as a rate-limited stream whose OFFSET AXIS IS THE COMMIT LOG:

- ``initialOffset`` = ``since_version``; ``latestOffset`` advances by at
  most ``commits_per_trigger`` committed versions per micro-batch, so a
  batch is always a whole number of commits IN COMMIT ORDER.  (A file
  source with ``maxFilesPerTrigger`` cannot promise this: a commit whose
  change set spans several files would be split mid-commit, and ordering
  rides on file modification times.)  With ``commits_per_trigger=1`` each
  micro-batch is EXACTLY one commit — the replay granularity the SCD2 /
  IVM maintainers need.
- ``partitions`` (driver, metadata-only): per transition, the commit
  record scopes the diff to touched buckets (the batch CDF's
  manifest-filter discipline — a trickle upsert's feed costs two bucket
  reads, never two table scans); each (transition, bucket) pair whose
  manifest entry actually changed becomes one input partition, so the
  diff parallelizes across buckets.
- ``read`` (executors, Arrow): loads the bucket's old/new parquet through
  pyarrow, applies deletion-vector sidecars and metadata-only
  added-column fills, diffs by the table key in pandas, and classifies
  rows exactly like the batch feed (``insert`` / ``delete`` /
  ``update_preimage`` / ``update_postimage``; unchanged rows never
  appear).  Metadata-only commits emit nothing and version-skip.

Unsupported (raise at stream construction, driver-side, whether the
stream was built via :func:`merge.stream_changes` or a bare
``readStream.format("mongraph_cdf")``): tables with GENERATED columns
(their fills are SQL expressions the Arrow-side reader does not
evaluate — use the batch ``read_changes``) and un-keyed tables (row
identity is the key, same as the batch feed).

Finite replay / ``Trigger.AvailableNow``: the Python data-source JVM
wrapper lacks ``SupportsTriggerAvailableNow`` and snapshots ONE
``latestOffset`` at query start as the drain target, so a rate-limited
stream under ``availableNow`` stops after ``commits_per_trigger``
commits — a silent partial drain.  The supported catch-up shape is the
``stop_at_version`` option ("latest" or a version number): the reader
freezes the drain target at stream start and advertises it un-paced, so
``trigger(availableNow=True)`` drains exactly to the snapshot and the
query terminates on its own (Delta's ``availableNow`` over
``table_changes``, re-expressed).  Checkpoint restarts re-snapshot
"latest" at restart time, preserving exactly-once.

At 100 TB this is the store's native CDC subscription: progress tracking
and recovery ride the engine's streaming checkpoint (offsets are plain
version numbers), per-trigger cost tracks the commit's change set, and
the source never materializes a spool copy of the feed.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

FORMAT_NAME = "mongraph_cdf"


def _version_name(n: int) -> str:
    return f"v_{n:05d}"


class _CdfPartition(InputPartition):
    """One (transition, bucket) diff unit.  Carries everything the
    executor needs as plain JSON-able fields — file dirs, DV key-file
    paths, the key, logical→physical names, constant fills — so ``read``
    never touches store metadata."""

    def __init__(
        self,
        version: int,
        mode: str,  # 'diff' | 'insert_all' | 'delete_all'
        old_dir: str | None,
        new_dir: str | None,
        dv_old: list[str],
        dv_new: list[str],
        key: str,
        cols: list[str],
        phys: dict[str, str],
        fills: dict[str, object],
    ) -> None:
        self.version = version
        self.mode = mode
        self.old_dir = old_dir
        self.new_dir = new_dir
        self.dv_old = dv_old
        self.dv_new = dv_new
        self.key = key
        self.cols = cols
        self.phys = phys
        self.fills = fills


class CdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.root = options["root"]
        self.since = int(options.get("since_version", -1))
        until = options.get("until_version")
        self.until = None if until is None else int(until)
        self.per_trigger = max(1, int(options.get("commits_per_trigger", 1)))
        # finite-replay pin (the Trigger.AvailableNow contract the Python
        # data-source wrapper can't express natively — it snapshots ONE
        # latestOffset, so pacing would silently truncate the drain):
        # "latest" freezes the commit-log head AT STREAM START as the
        # drain target, and pacing is disabled so the single advertised
        # offset covers the whole snapshot.  On a checkpoint restart the
        # reader is rebuilt, so the head is re-snapshotted at restart
        # time — exactly Delta's availableNow-on-table_changes shape.
        stop = options.get("stop_at_version")
        if stop is not None:
            tgt = self._cur_num() if str(stop) == "latest" else int(stop)
            tgt = self.since if tgt is None else tgt
            self.until = tgt if self.until is None else min(self.until, tgt)
            self.per_trigger = None  # un-paced: one catch-up advertisement
        # the unsupported shapes fail AT STREAM CONSTRUCTION, driver-side,
        # even for a bare readStream.format("mongraph_cdf") that never went
        # through merge.stream_changes (whose guards these mirror): read()
        # would silently NULL-fill generated columns, and partitions()
        # needs a key for row identity.
        meta = self._meta()
        if meta.get("key") is None:
            raise ValueError("mongraph_cdf requires a bucketed (keyed) table")
        if any("expr" in c for c in (meta.get("added") or [])):
            raise NotImplementedError(
                "mongraph_cdf does not evaluate generated-column fills; "
                "use the batch read_changes"
            )

    # -- store metadata (driver-side only) --------------------------------

    def _meta(self) -> dict:
        from mongraph_spark.sources import merge as M

        return M._read_meta(self.root)

    def _cur_num(self) -> int | None:
        from mongraph_spark.sources import merge as M

        cur = M.current_version(self.root)
        return None if cur is None else int(cur.split("_")[1])

    # -- streaming contract ------------------------------------------------

    def initialOffset(self) -> dict:
        return {"version": self.since}

    def latestOffset(self) -> dict:
        # the rate limit: at most per_trigger committed versions per
        # micro-batch, never past the table's current pointer (or the
        # pinned until_version)
        cur = self._cur_num()
        hi = self.since if cur is None else cur
        if self.until is not None:
            hi = min(hi, self.until)
        # RESTART SAFETY (the cursor must never advertise an offset
        # behind the engine's committed one — that would make the engine
        # record a regressed offset and redeliver already-processed
        # commits).  The engine's verified call order (traced on this
        # Spark version, pinned by
        # test_checkpoint_restart_resumes_exactly_once with TWO
        # committed batches + two while-down commits) is:
        #   fresh stream:  latestOffset → initialOffset → partitions
        #   ckpt restart:  partitions(checkpointed lo..hi) FIRST, then
        #                  latestOffset
        # so on a restart partitions() has already max-synced the cursor
        # to the committed offset before we are ever asked for a new
        # one, and an unset cursor here can only mean a FRESH stream:
        # pace from `since`.
        last = getattr(self, "_last_planned", self.since)
        if self.per_trigger is None:  # finite replay: un-paced
            nxt = hi
        else:
            nxt = min(hi, last + self.per_trigger)
        self._last_planned = max(last, nxt)
        return {"version": nxt}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from mongraph_spark.sources import merge as M

        lo, hi = int(start["version"]), int(end["version"])
        # keep the rate-limit cursor consistent with the engine's actual
        # planning — on a checkpoint restart this call (with the
        # checkpointed offsets) comes BEFORE any latestOffset, so it is
        # what makes the cursor restart-safe (see latestOffset)
        self._last_planned = max(getattr(self, "_last_planned", lo), lo, hi)
        meta = self._meta()
        key = meta.get("key")
        if key is None:
            raise ValueError("mongraph_cdf requires a bucketed (keyed) table")
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        cols = [f.name for f in schema.fields]
        renames = meta.get("renames") or {}
        fills = {
            c["name"]: c.get("default")
            for c in (meta.get("added") or [])
            if "expr" not in c
        }
        parts: list[InputPartition] = []
        for n in range(lo + 1, hi + 1):
            rec = M._read_commit(self.root, _version_name(n)) or {}
            op = rec.get("op")
            # the STORE's own metadata-only set, not a mirror — partitions()
            # runs driver-side where merge is already imported, so a new
            # no-row-change op added there can never silently diverge here
            if op in M._CDF_NO_ROW_CHANGE_OPS:
                continue
            buckets = rec.get("buckets")
            scope = set(buckets) if isinstance(buckets, list) else None
            man_new = M._read_manifest(self.root, _version_name(n))
            man_old = (
                {} if op == "init"
                else M._read_manifest(self.root, _version_name(n - 1))
            )
            dv_new = M._read_dv(self.root, _version_name(n))
            dv_old = M._read_dv(self.root, _version_name(n - 1))
            all_buckets = set(man_new) | set(man_old)
            for b in sorted(all_buckets):
                if scope is not None and b not in scope:
                    continue
                old_rel = man_old.get(b)
                new_rel = man_new.get(b)
                dvo = dv_old.get(b, [])
                dvn = dv_new.get(b, [])
                if old_rel == new_rel and dvo == dvn:
                    continue  # untouched bucket: provably no row changes
                mode = (
                    "insert_all" if old_rel is None
                    else "delete_all" if new_rel is None
                    else "diff"
                )
                parts.append(
                    _CdfPartition(
                        version=n,
                        mode=mode,
                        old_dir=(
                            None if old_rel is None
                            else os.path.join(self.root, old_rel)
                        ),
                        new_dir=(
                            None if new_rel is None
                            else os.path.join(self.root, new_rel)
                        ),
                        dv_old=[os.path.join(self.root, p) for p in dvo],
                        dv_new=[os.path.join(self.root, p) for p in dvn],
                        key=key,
                        cols=cols,
                        phys={c: renames.get(c, c) for c in cols},
                        fills=fills,
                    )
                )
        return parts

    def read(self, partition: _CdfPartition) -> Iterator[tuple]:
        import pandas as pd
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        p = partition
        phys_names = [p.phys[c] for c in p.cols]

        def load(d: str | None, dv_paths: list[str]) -> "pd.DataFrame | None":
            if d is None:
                return None
            dset = ds.dataset(d, format="parquet")
            present = [n for n in phys_names if n in dset.schema.names]
            tbl = dset.to_table(columns=present)
            df = tbl.to_pandas()
            # physical -> logical, metadata-only added columns fill
            inv = {p.phys[c]: c for c in p.cols}
            df = df.rename(columns=inv)
            for c in p.cols:
                if c not in df.columns:
                    df[c] = p.fills.get(c)
            df = df[p.cols]
            if dv_paths:
                phys_key = p.phys[p.key]
                deleted = pd.concat(
                    [
                        pq.read_table(q, columns=[phys_key]).to_pandas()
                        for q in dv_paths
                    ]
                )[phys_key].unique()
                df = df[~df[p.key].isin(set(deleted))]
            return df

        old = load(p.old_dir, p.dv_old)
        new = load(p.new_dir, p.dv_new)

        def rows(df: "pd.DataFrame", change: str) -> Iterator[tuple]:
            for t in df[p.cols].itertuples(index=False):
                yield (*t, change, p.version)

        if p.mode == "insert_all" or old is None:
            if new is not None:
                yield from rows(new, "insert")
            return
        if p.mode == "delete_all" or new is None:
            yield from rows(old, "delete")
            return
        merged = old.merge(
            new, on=p.key, how="outer", suffixes=("_o", "_n"), indicator=True
        )
        val_cols = [c for c in p.cols if c != p.key]
        left = merged[merged["_merge"] == "left_only"]
        right = merged[merged["_merge"] == "right_only"]
        both = merged[merged["_merge"] == "both"]
        if val_cols:
            same = pd.Series(True, index=both.index)
            for c in val_cols:
                o, nw = both[f"{c}_o"], both[f"{c}_n"]
                same &= (o == nw) | (o.isna() & nw.isna())
            changed = both[~same]
        else:
            changed = both.iloc[0:0]

        def side(df: "pd.DataFrame", suffix: str) -> "pd.DataFrame":
            out = df[[p.key] + [f"{c}{suffix}" for c in val_cols]].copy()
            out.columns = [p.key] + val_cols
            return out[p.cols]

        yield from rows(side(left, "_o"), "delete")
        yield from rows(side(right, "_n"), "insert")
        yield from rows(side(changed, "_o"), "update_preimage")
        yield from rows(side(changed, "_n"), "update_postimage")

    def commit(self, end: dict) -> None:
        pass


class CdfDataSource(DataSource):
    """``format("mongraph_cdf")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        from mongraph_spark.sources import merge as M

        meta = M._read_meta(self.options["root"])
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        return T.StructType(
            list(schema.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.LongType(), False),
            ]
        )

    def streamReader(self, schema: T.StructType) -> CdfStreamReader:
        return CdfStreamReader(dict(self.options))
