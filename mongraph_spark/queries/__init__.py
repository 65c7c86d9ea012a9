"""Oracle-checked query suites.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[str, str]`` (DuckDB SQL).  ``__spark_entry__.py`` aggregates
them for the driver's correctness gate.
"""

from __future__ import annotations


def collect_suites(*modules) -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for m in modules:
        for k, v in m.QUERIES.items():
            if k in queries:
                raise ValueError(f"duplicate query name: {k}")
            queries[k] = v
        for k, v in getattr(m, "ORACLES", {}).items():
            oracles[k] = v
    return queries, oracles
