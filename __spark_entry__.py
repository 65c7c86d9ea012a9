"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (graph traversal + populate enrichment
join) on sf0.001.  ``queries()`` / ``oracle_sql()`` — one entry per
implemented operator from SURVEY.md §2, each oracle-checked against DuckDB
at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongraph_spark.queries import collect_suites  # noqa: E402
from mongraph_spark.queries import graph as graph_queries  # noqa: E402
from mongraph_spark.queries import relational as relational_queries  # noqa: E402
from mongraph_spark.queries import tpch_full as tpch_full_queries  # noqa: E402
from mongraph_spark.queries import text as text_queries  # noqa: E402
from mongraph_spark.queries import search as search_queries  # noqa: E402
from mongraph_spark.queries import dedup as dedup_queries  # noqa: E402
from mongraph_spark.queries import similarity as similarity_queries  # noqa: E402
from mongraph_spark.queries import events as events_queries  # noqa: E402
from mongraph_spark.queries import graph_analytics as graph_analytics_queries  # noqa: E402
from mongraph_spark.queries import multimodal as multimodal_queries  # noqa: E402
from mongraph_spark.queries import pipeline as pipeline_queries  # noqa: E402
from mongraph_spark.queries import corpus as corpus_queries  # noqa: E402
from mongraph_spark.streaming import events as streaming_events  # noqa: E402

_SUITES = [
    graph_queries,
    relational_queries,
    tpch_full_queries,
    text_queries,
    search_queries,
    dedup_queries,
    similarity_queries,
    events_queries,
    graph_analytics_queries,
    multimodal_queries,
    pipeline_queries,
    corpus_queries,
    streaming_events,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1-hop traversal + cross-store populate enrichment join
    (the reference's semantic heart, SURVEY.md §2.4) at sf0.001."""
    from mongraph_spark.queries.graph import populate_enrich

    return populate_enrich(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = collect_suites(*_SUITES)
    return qs


def oracle_sql() -> dict[str, str]:
    _, oracles = collect_suites(*_SUITES)
    return oracles
