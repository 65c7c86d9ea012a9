"""Dump ``.explain("formatted")`` for named registry queries to files.

Optimization-round evidence: ``plans/r<N>/<query>_<tag>.txt`` holds the
formatted physical plan for each query at the moment it was captured
(``before`` = at the round's inherited HEAD, ``after`` = post-change), so
plan-shape claims in OPTIMIZATION_r<N>.md are checkable without running
Spark.

Usage: python tools/dump_plans.py --tag before --round 12 [--sf-dir DIR] name...
       (no names = every core-window query)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mongraph_spark.sparkutil import DEFAULT_SF_DIR, get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", type=int, default=12)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("dump_plans")
    all_qs = {**entrymod.extended_queries(), **entrymod.queries()}
    names = args.names or list(entrymod.queries())
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = all_qs[name]
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - record the failure, keep going
            plan = f"ERROR building/explaining {name}: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
