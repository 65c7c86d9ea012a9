"""Pins a PySpark 4.1 correctness pitfall this engine must avoid: multiple
sibling higher-order functions built with the *Python lambda API* in one
projection mis-resolve (sibling transforms silently share one lambda body),
giving wrong AND run-to-run-unstable results.  SQL-level lambdas via
``F.expr`` are correct.  mongraph_spark policy: any projection with more
than one HOF uses ``F.expr`` lambdas (see queries/dedup.py `_minhash_sig`).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SHINGLES = ["aa bb cc", "bb cc dd", "cc dd ee"]


def _expected(i: int) -> str:
    return min(hashlib.md5(f"seed{i}:{s}".encode()).hexdigest() for s in SHINGLES)


def test_expr_lambdas_are_correct_for_sibling_hofs(spark):
    df = spark.createDataFrame([(1, SHINGLES)], "id int, sh array<string>")
    row = df.select(
        *[
            F.expr(
                f"array_min(transform(sh, s{i} -> md5(concat('seed{i}:', s{i}))))"
            ).alias(f"mh{i}")
            for i in range(4)
        ]
    ).collect()[0]
    assert [row[f"mh{i}"] for i in range(4)] == [_expected(i) for i in range(4)]


def test_minhash_signature_stability(spark):
    """The production signature builder returns correct, stable values."""
    from mongraph_spark.queries.dedup import _minhash_sig

    df = spark.createDataFrame([(1, SHINGLES)], "id int, shingles array<string>")
    r1 = df.select(*_minhash_sig("shingles")).collect()[0]
    r2 = df.select(*_minhash_sig("shingles")).collect()[0]
    assert r1 == r2
    assert r1["mh0"] == _expected(0)
    assert r1["mh7"] == _expected(7)
