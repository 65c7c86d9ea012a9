"""Deterministic property graph derived from the driver's TPC-H-ish tables.

The reference engine (pstaender/mongraph) operates on MongoDB document
collections mirrored into a Neo4j node/edge graph (see SURVEY.md §1).  The
driver's test data has no graph tables, so we *derive* one, deterministically,
from the relational tables — the same construction is expressed once here as
Spark DataFrames and once as a DuckDB SQL CTE prefix (``ORACLE_GRAPH_CTES``)
so every graph operator can be oracle-checked.

Graph shape (collection code → node_id = code * 10^12 + natural key):

    region(1)  <-[in_region]-    nation(2)
    nation(2)  <-[located_in]-   customer(3), supplier(4)
    customer(3) -[placed]->      orders(6)
    orders(6)  -[contains]->     part(5)        (one edge per lineitem)
    orders(6)  -[supplied_by]->  supplier(4)    (one edge per lineitem)

Reference invariants preserved (SURVEY.md §1.2, reference
src/extendDocument.coffee:176,220-225):

- every node carries ``_id`` (24-hex document id) + ``_collection``;
- every edge redundantly stores ``_from``/``_to`` as ``"<collection>:<_id>"``
  composite strings and a ``_created_at`` epoch-seconds column;
- edge attributes live in a ``props`` map<string,string>.

Document ``_id`` is ``substr(md5('<collection>:<key>'), 1, 24)`` — computable
identically in Spark and DuckDB, and shaped like the reference's 24-hex BSON
ObjectId (reference test/tests.coffee:29).

Scale notes: nodes/edges are pure projections + unions over the base parquet
scans — no shuffle at all to build them; Catalyst pushes query filters down
through the union into the scans.  Joins against dimension collections
(region/nation/supplier) are broadcast-sized at any SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import read_table

# collection → (code, key column, source table)
COLLECTIONS: dict[str, tuple[int, str]] = {
    "region": (1, "r_regionkey"),
    "nation": (2, "n_nationkey"),
    "customer": (3, "c_custkey"),
    "supplier": (4, "s_suppkey"),
    "part": (5, "p_partkey"),
    "orders": (6, "o_orderkey"),
}

_CODE_BASE = 10**12


def node_id_col(collection: str, key: F.Column | str) -> F.Column:
    code, _ = COLLECTIONS[collection][0], None
    key_col = F.col(key) if isinstance(key, str) else key
    return (F.lit(code * _CODE_BASE) + key_col.cast("long")).cast("long")


def doc_id_col(collection: str, key: F.Column | str) -> F.Column:
    key_col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(collection + ":"), key_col.cast("string"))), 1, 24)


def from_to_col(collection: str, key: F.Column | str) -> F.Column:
    """Composite "<collection>:<_id>" endpoint locator (extendDocument.coffee:220-222)."""
    return F.concat(F.lit(collection + ":"), doc_id_col(collection, key))


def nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One mirror node per document row across all collections.

    Pure narrow transformation (scan → project → union); zero shuffles.
    """
    parts = []
    for coll, (code, key) in COLLECTIONS.items():
        t = read_table(spark, sf_dir, coll)
        parts.append(
            t.select(
                node_id_col(coll, key).alias("node_id"),
                doc_id_col(coll, key).alias("_id"),
                F.lit(coll).alias("_collection"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def documents(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Per-collection document DataFrames: the raw table plus the derived
    ``_id`` column (the cross-store join key, SURVEY.md §1.2)."""
    out = {}
    for coll, (code, key) in COLLECTIONS.items():
        t = read_table(spark, sf_dir, coll)
        out[coll] = t.withColumn("_id", doc_id_col(coll, key))
    return out


def materialized_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build-once, query-many graph storage (the scale design).

    The reference maintains its node/edge store *incrementally* (mirror sync
    on every save — src/mongraphMongoosePlugin.coffee:43-61); it never derives
    edges at query time.  Equivalent here: nodes/edges are written once as
    parquet — edges partitioned by ``type`` (type filters become partition
    pruning) and sorted by ``src`` within partitions (anchored traversals
    become parquet min/max row-group skips); nodes partitioned by
    ``_collection``.  At 100 TB these are first-class stored tables
    (bucketed by src for shuffle-free traversal joins); locally a per-SF
    cache directory.
    """
    key = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        os.environ.get("MONGRAPH_GRAPH_CACHE", "/root/repo/.graph_cache"), key
    )
    npath, epath = f"{base}/nodes.parquet", f"{base}/edges.parquet"
    if not os.path.exists(f"{npath}/_SUCCESS"):
        # repartition(1) is LOCAL-CACHE-ONLY: it serializes the node write so
        # each _collection partition is one sorted file (fast to re-scan at
        # these SFs).  A real store build must repartition on the partition
        # column instead — repartition("_collection") — or the single writer
        # becomes the bottleneck; see the bucketed_edges build below for the
        # scale-correct shape.
        nodes(spark, sf_dir).repartition(1).sortWithinPartitions("node_id").write.mode(
            "overwrite"
        ).partitionBy("_collection").parquet(npath)
    if not os.path.exists(f"{epath}/_SUCCESS"):
        edges(spark, sf_dir).repartition("type").sortWithinPartitions("src", "dst").write.mode(
            "overwrite"
        ).partitionBy("type").parquet(epath)
    return spark.read.parquet(npath), spark.read.parquet(epath)


EDGE_BUCKETS = 16


def bucketed_edges(spark: SparkSession, sf_dir: str, buckets: int = EDGE_BUCKETS) -> DataFrame:
    """Build-once *bucketed* edge store: ``bucketBy(src)`` + ``sortBy(src)``.

    This is the 100 TB answer to traversal joins: any join keyed on ``src``
    (frontier expansion, 2-hop composition) reads the edge table's buckets
    directly — the multi-TB side never shuffles, only the probe side is
    exchanged into the matching 16-way hash partitioning.  ``sortBy`` lets
    sort-merge joins skip the per-partition sort of the big side too.
    Locally a tiny warehouse table; at scale the same two lines with a
    bucket count sized to cluster cores.
    """
    key = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tab = f"mg_edges_bucketed_{key}"
    if not spark.catalog.tableExists(tab):
        # bucketing metadata lives in the (session-scoped) catalog; a
        # leftover warehouse dir from a previous session has lost it — drop
        # and rewrite so the table registers with its bucket spec
        import shutil

        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        leftover = os.path.join(warehouse, tab.lower())
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
        (
            edges(spark, sf_dir)
            .repartition(buckets, "src")
            .write.mode("overwrite")
            .bucketBy(buckets, "src")
            .sortBy("src")
            .format("parquet")
            .saveAsTable(tab)
        )
    return spark.table(tab)


_ENGINE_CACHE: dict[tuple[int, str, bool], object] = {}


def bulk_engine(spark: SparkSession, sf_dir: str, materialized: bool = True):
    """A Mongraph engine in bulk/analytics mode over the derived graph.

    ``materialized=True`` (default) reads the build-once graph store;
    ``False`` derives nodes/edges on the fly from the base tables (used to
    verify the construction itself).
    """
    from mongraph_spark.session import Mongraph

    cache_key = (id(spark), sf_dir, materialized)
    eng = _ENGINE_CACHE.get(cache_key)
    if eng is not None:
        return eng
    if materialized:
        n, e = materialized_graph(spark, sf_dir)
    else:
        n, e = nodes(spark, sf_dir), edges(spark, sf_dir)
    eng = Mongraph.from_dataframes(
        spark, nodes=n, edges=e, documents=documents(spark, sf_dir)
    )
    _ENGINE_CACHE[cache_key] = eng
    return eng


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed, typed, attributed relationship set.

    Schema: rel_id long, src long, dst long, type string,
            _from string, _to string, _created_at long,
            props map<string,string>.
    Narrow (scan → project → union) — no shuffle to construct.
    """
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    empty_props = F.create_map().cast("map<string,string>")

    in_region = nation.select(
        (F.lit(1 * _CODE_BASE) + F.col("n_nationkey").cast("long")).alias("rel_id"),
        node_id_col("nation", "n_nationkey").alias("src"),
        node_id_col("region", "n_regionkey").alias("dst"),
        F.lit("in_region").alias("type"),
        from_to_col("nation", "n_nationkey").alias("_from"),
        from_to_col("region", "n_regionkey").alias("_to"),
        F.lit(0).cast("long").alias("_created_at"),
        empty_props.alias("props"),
    )
    cust_located = customer.select(
        (F.lit(2 * _CODE_BASE) + F.col("c_custkey").cast("long")).alias("rel_id"),
        node_id_col("customer", "c_custkey").alias("src"),
        node_id_col("nation", "c_nationkey").alias("dst"),
        F.lit("located_in").alias("type"),
        from_to_col("customer", "c_custkey").alias("_from"),
        from_to_col("nation", "c_nationkey").alias("_to"),
        F.lit(0).cast("long").alias("_created_at"),
        empty_props.alias("props"),
    )
    supp_located = supplier.select(
        (F.lit(3 * _CODE_BASE) + F.col("s_suppkey").cast("long")).alias("rel_id"),
        node_id_col("supplier", "s_suppkey").alias("src"),
        node_id_col("nation", "s_nationkey").alias("dst"),
        F.lit("located_in").alias("type"),
        from_to_col("supplier", "s_suppkey").alias("_from"),
        from_to_col("nation", "s_nationkey").alias("_to"),
        F.lit(0).cast("long").alias("_created_at"),
        empty_props.alias("props"),
    )
    placed = orders.select(
        (F.lit(4 * _CODE_BASE) + F.col("o_orderkey").cast("long")).alias("rel_id"),
        node_id_col("customer", "o_custkey").alias("src"),
        node_id_col("orders", "o_orderkey").alias("dst"),
        F.lit("placed").alias("type"),
        from_to_col("customer", "o_custkey").alias("_from"),
        from_to_col("orders", "o_orderkey").alias("_to"),
        F.unix_timestamp("o_orderdate").alias("_created_at"),
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ).alias("props"),
    )
    contains = lineitem.select(
        (
            F.lit(5 * _CODE_BASE)
            + F.col("l_orderkey").cast("long") * 10
            + F.col("l_linenumber").cast("long")
        ).alias("rel_id"),
        node_id_col("orders", "l_orderkey").alias("src"),
        node_id_col("part", "l_partkey").alias("dst"),
        F.lit("contains").alias("type"),
        from_to_col("orders", "l_orderkey").alias("_from"),
        from_to_col("part", "l_partkey").alias("_to"),
        F.unix_timestamp("l_shipdate").alias("_created_at"),
        F.create_map(
            F.lit("quantity"), F.col("l_quantity").cast("string"),
            F.lit("returnflag"), F.col("l_returnflag"),
        ).alias("props"),
    )
    supplied_by = lineitem.select(
        (
            F.lit(6 * _CODE_BASE)
            + F.col("l_orderkey").cast("long") * 10
            + F.col("l_linenumber").cast("long")
        ).alias("rel_id"),
        node_id_col("orders", "l_orderkey").alias("src"),
        node_id_col("supplier", "l_suppkey").alias("dst"),
        F.lit("supplied_by").alias("type"),
        from_to_col("orders", "l_orderkey").alias("_from"),
        from_to_col("supplier", "l_suppkey").alias("_to"),
        F.unix_timestamp("l_shipdate").alias("_created_at"),
        F.create_map(F.lit("quantity"), F.col("l_quantity").cast("string")).alias("props"),
    )

    out = in_region
    for p in (cust_located, supp_located, placed, contains, supplied_by):
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle: the *same* graph as SQL CTEs (driver pre-registers the base
# tables as views).  Edge props are exposed as scalar columns (quantity,
# status, returnflag, priority) because DuckDB/Spark map equality is not
# hash-stable across engines; queries project scalars, never raw maps.
# ---------------------------------------------------------------------------

_NODE_SELECTS = []
for _coll, (_code, _key) in COLLECTIONS.items():
    _NODE_SELECTS.append(
        f"SELECT {_code * _CODE_BASE} + CAST({_key} AS BIGINT) AS node_id, "
        f"substr(md5('{_coll}:' || CAST({_key} AS VARCHAR)), 1, 24) AS _id, "
        f"'{_coll}' AS _collection FROM {_coll}"
    )

ORACLE_NODES_CTE = "g_nodes AS (\n  " + "\n  UNION ALL\n  ".join(_NODE_SELECTS) + "\n)"


def _oid(coll: str, key_expr: str) -> str:
    return f"substr(md5('{coll}:' || CAST({key_expr} AS VARCHAR)), 1, 24)"


def _from_to(coll: str, key_expr: str) -> str:
    return f"'{coll}:' || {_oid(coll, key_expr)}"


ORACLE_EDGES_CTE = f"""g_edges AS (
  SELECT {1 * _CODE_BASE} + CAST(n_nationkey AS BIGINT) AS rel_id,
         {2 * _CODE_BASE} + CAST(n_nationkey AS BIGINT) AS src,
         {1 * _CODE_BASE} + CAST(n_regionkey AS BIGINT) AS dst,
         'in_region' AS type,
         {_from_to('nation', 'n_nationkey')} AS _from,
         {_from_to('region', 'n_regionkey')} AS _to,
         CAST(0 AS BIGINT) AS _created_at,
         CAST(NULL AS DOUBLE) AS quantity, CAST(NULL AS VARCHAR) AS status,
         CAST(NULL AS VARCHAR) AS returnflag, CAST(NULL AS VARCHAR) AS priority
  FROM nation
  UNION ALL
  SELECT {2 * _CODE_BASE} + CAST(c_custkey AS BIGINT),
         {3 * _CODE_BASE} + CAST(c_custkey AS BIGINT),
         {2 * _CODE_BASE} + CAST(c_nationkey AS BIGINT),
         'located_in',
         {_from_to('customer', 'c_custkey')},
         {_from_to('nation', 'c_nationkey')},
         CAST(0 AS BIGINT), NULL, NULL, NULL, NULL
  FROM customer
  UNION ALL
  SELECT {3 * _CODE_BASE} + CAST(s_suppkey AS BIGINT),
         {4 * _CODE_BASE} + CAST(s_suppkey AS BIGINT),
         {2 * _CODE_BASE} + CAST(s_nationkey AS BIGINT),
         'located_in',
         {_from_to('supplier', 's_suppkey')},
         {_from_to('nation', 's_nationkey')},
         CAST(0 AS BIGINT), NULL, NULL, NULL, NULL
  FROM supplier
  UNION ALL
  SELECT {4 * _CODE_BASE} + CAST(o_orderkey AS BIGINT),
         {3 * _CODE_BASE} + CAST(o_custkey AS BIGINT),
         {6 * _CODE_BASE} + CAST(o_orderkey AS BIGINT),
         'placed',
         {_from_to('customer', 'o_custkey')},
         {_from_to('orders', 'o_orderkey')},
         CAST(epoch(o_orderdate) AS BIGINT), NULL, o_orderstatus, NULL, o_orderpriority
  FROM orders
  UNION ALL
  SELECT {5 * _CODE_BASE} + CAST(l_orderkey AS BIGINT) * 10 + CAST(l_linenumber AS BIGINT),
         {6 * _CODE_BASE} + CAST(l_orderkey AS BIGINT),
         {5 * _CODE_BASE} + CAST(l_partkey AS BIGINT),
         'contains',
         {_from_to('orders', 'l_orderkey')},
         {_from_to('part', 'l_partkey')},
         CAST(epoch(l_shipdate) AS BIGINT), l_quantity, NULL, l_returnflag, NULL
  FROM lineitem
  UNION ALL
  SELECT {6 * _CODE_BASE} + CAST(l_orderkey AS BIGINT) * 10 + CAST(l_linenumber AS BIGINT),
         {6 * _CODE_BASE} + CAST(l_orderkey AS BIGINT),
         {4 * _CODE_BASE} + CAST(l_suppkey AS BIGINT),
         'supplied_by',
         {_from_to('orders', 'l_orderkey')},
         {_from_to('supplier', 'l_suppkey')},
         CAST(epoch(l_shipdate) AS BIGINT), l_quantity, NULL, NULL, NULL
  FROM lineitem
)"""

ORACLE_GRAPH_CTES = f"{ORACLE_NODES_CTE},\n{ORACLE_EDGES_CTE}"


def oracle_with(body_sql: str, extra_ctes: str = "") -> str:
    """Wrap a query body with the shared graph CTE prefix."""
    extra = f",\n{extra_ctes}" if extra_ctes else ""
    return f"WITH {ORACLE_GRAPH_CTES}{extra}\n{body_sql}"
