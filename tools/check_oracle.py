"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given SF, compare row count +
column names + order-insensitive values.

Usage: python tools/check_oracle.py [--strict] [--extended|--all]
           [--shuffle-partitions N] [--driver-memory SIZE] [sf_dir] [query_name ...]

``--driver-memory`` raises the strict session's heap (default: Spark's 1g).
CAPACITY ONLY, never semantics: the strict contract is about vanilla
*behavioral* configs (timezone, AQE, nanosAsLong) and exact value strings;
heap size just has to fit the SF under test.  The full-registry run at
sf0.1 needs it — 241 queries in one 1g JVM OOM on accumulated
localCheckpoint blocks long before any single query would.

``--extended`` checks the registry entries OUTSIDE the driver's core window
(``extended_queries()``); ``--all`` checks core + extended.  Default: core.

``--strict`` reproduces the evaluation driver's conditions instead of our
tuned harness: (a) a VANILLA SparkSession (no nanosAsLong, no UTC pin, no
AQE tuning) so any query that silently depends on our session config fails
here first, and (b) exact value stringification — ``str(v)`` with no %.6g
float normalization — so an int-vs-float divergence (e.g. DuckDB HUGEINT →
pandas float64) is a mismatch, exactly as the driver's value hash sees it.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mongraph_spark.sparkutil import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df, cols, strict: bool = False):
    rows = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                elif strict:
                    vals.append(str(v))  # int-typed 24968 vs float 24968.0 differ
                else:
                    vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def main() -> int:
    argv = sys.argv[1:]
    strict = "--strict" in argv
    extended = "--extended" in argv
    all_q = "--all" in argv
    # --shuffle-partitions N: force spark.sql.shuffle.partitions, for the
    # cross-partitioning determinism gate (the registry's numeric claims —
    # md5-derived randomness, fixed-order float accumulation, integer
    # floors — must not drift with partition count; run once at a small
    # prime and once at 32 and both must be N/N green)
    shuffle_parts = None
    if "--shuffle-partitions" in argv:
        i = argv.index("--shuffle-partitions")
        shuffle_parts = argv[i + 1]
        del argv[i : i + 2]
    driver_mem = None
    if "--driver-memory" in argv:
        i = argv.index("--driver-memory")
        driver_mem = argv[i + 1]
        del argv[i : i + 2]
    argv = [a for a in argv if a not in ("--strict", "--extended", "--all")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if strict:
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[32]")
            .appName("check_oracle_strict")
            .config("spark.ui.enabled", "false")
        )
        if shuffle_parts is not None:
            builder = builder.config("spark.sql.shuffle.partitions", shuffle_parts)
        if driver_mem is not None:
            builder = builder.config("spark.driver.memory", driver_mem)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark("check_oracle")
        if shuffle_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    if all_q:
        qs = {**entrymod.queries(), **entrymod.extended_queries()}
        oracles = {**entrymod.oracle_sql(), **entrymod.extended_oracle_sql()}
    elif extended:
        qs = entrymod.extended_queries()
        oracles = entrymod.extended_oracle_sql()
    else:
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        finally:
            # Drop the py4j refs the finished query left behind so the
            # ContextCleaner can actually free its localCheckpoint blocks:
            # across a 241-query session those blocks otherwise accumulate
            # to an OOM no individual query would ever cause.
            import gc

            gc.collect()
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures.append(name)
            continue
        scols = sorted(c.lower() for c in sdf.columns)
        dcols = sorted(c.lower() for c in ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures.append(name)
            continue
        sdf.columns = [c.lower() for c in sdf.columns]
        ddf.columns = [c.lower() for c in ddf.columns]
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
            failures.append(name)
            continue
        srows, drows = normalize(sdf, scols, strict), normalize(ddf, scols, strict)
        if srows != drows:
            diff = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff:
                print(f"  spark: {srows[i]}")
                print(f"  duck : {drows[i]}")
            failures.append(name)
            continue
        print(f"OK   {name} ({len(sdf)} rows)")
    n_ran = len([n for n in qs if not only or n in only])
    print(f"\n{n_ran - len(failures)}/{n_ran} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
