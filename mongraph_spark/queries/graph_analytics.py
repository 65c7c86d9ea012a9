"""Graph analytics over the derived property graph (north-star scope:
"GraphX for graph analytics" — GraphX has no Python API, so these are
GraphFrames-style join-based computations over the node/edge DataFrames,
which is exactly what GraphX/GraphFrames compile to underneath).

- degree distribution: one groupBy over edges (map-side combine).
- PageRank: the Pregel pattern as DataFrame joins — contributions =
  ranks ⋈ edges, grouped by dst; a fixed 3-iteration unroll keeps the
  oracle expressible as chained SQL CTEs (no recursion).  At scale each
  iteration is one shuffle keyed on node id; lineage is cut by the
  materialized edge store being a parquet scan, and a production loop
  would localCheckpoint every few iterations (see paths.py BFS).

Float policy: ranks are floored to 1e-4 basis points — double error from
engine-dependent sum order is ~1e-12, vastly below the grid, so the hash
compare is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongraph_spark.graphs import tpch

DAMPING = 0.85
N_ITER = 3


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = tpch.bulk_engine(spark, sf_dir)
    e = eng.store.edges_df()
    out_deg = e.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_deg = e.groupBy(F.col("dst").alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    deg = out_deg.join(in_deg, "node_id", "full_outer").select(
        "node_id",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
    )
    # distribution: how many nodes have each (total degree) value
    return (
        deg.withColumn("degree", F.col("out_deg") + F.col("in_deg"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


ORACLE_DEGREE = tpch.oracle_with(
    """SELECT degree, count(*) AS n_nodes FROM (
  SELECT coalesce(o.out_deg, 0) + coalesce(i.in_deg, 0) AS degree
  FROM (SELECT src AS node_id, count(*) AS out_deg FROM g_edges GROUP BY src) o
  FULL OUTER JOIN (SELECT dst AS node_id, count(*) AS in_deg FROM g_edges GROUP BY dst) i
    ON o.node_id = i.node_id
) GROUP BY degree"""
)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = tpch.bulk_engine(spark, sf_dir)
    e = eng.store.edges_df().select("src", "dst")
    nodes = eng.store.nodes_df().select("node_id")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))

    ranks = nodes.select("node_id", F.lit(1.0).alias("rank"))
    for _ in range(N_ITER):
        contribs = (
            ranks.join(e, ranks["node_id"] == e["src"], "inner")
            .join(out_deg, "src")
            .select(F.col("dst").alias("node_id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node_id")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contribs, "node_id", "left").select(
            "node_id",
            (F.lit(1 - DAMPING) + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))).alias(
                "rank"
            ),
        )
    # report only the aggregate shape (top ranks are dominated by dims):
    # per collection: node count, min/max/sum of rank in basis points
    coll = (F.col("node_id") / F.lit(10**12)).cast("long")
    return (
        ranks.withColumn("coll_code", coll)
        .groupBy("coll_code")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.floor(F.lit(10000) * F.min("rank")).cast("long").alias("min_rank_bp"),
            F.floor(F.lit(10000) * F.max("rank")).cast("long").alias("max_rank_bp"),
            F.floor(F.lit(10000) * F.sum("rank")).cast("long").alias("sum_rank_bp"),
        )
    )


def _pagerank_oracle() -> str:
    body = """
nodes0 AS (SELECT node_id FROM g_nodes),
outdeg AS (SELECT src, count(*) AS out_deg FROM g_edges GROUP BY src),
r0 AS (SELECT node_id, 1.0 AS rank FROM nodes0)"""
    prev = "r0"
    for k in range(1, N_ITER + 1):
        body += f""",
c{k} AS (
  SELECT e.dst AS node_id, sum(r.rank / d.out_deg) AS contrib
  FROM {prev} r JOIN g_edges e ON r.node_id = e.src
  JOIN outdeg d ON e.src = d.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT n.node_id, {1 - DAMPING} + {DAMPING} * coalesce(c.contrib, 0.0) AS rank
  FROM nodes0 n LEFT JOIN c{k} c ON n.node_id = c.node_id
)"""
        prev = f"r{k}"
    return tpch.oracle_with(
        f"""SELECT CAST(node_id // 1000000000000 AS BIGINT) AS coll_code,
       count(*) AS n_nodes,
       CAST(floor(10000 * min(rank)) AS BIGINT) AS min_rank_bp,
       CAST(floor(10000 * max(rank)) AS BIGINT) AS max_rank_bp,
       CAST(floor(10000 * sum(rank)) AS BIGINT) AS sum_rank_bp
FROM {prev}
GROUP BY 1""",
        extra_ctes=body.lstrip(",\n"),
    )


ORACLE_PAGERANK = _pagerank_oracle()


QUERIES = {
    "graph_degree_distribution": graph_degree_distribution,
    "graph_pagerank": graph_pagerank,
}

ORACLES = {
    "graph_degree_distribution": ORACLE_DEGREE,
    "graph_pagerank": ORACLE_PAGERANK,
}
