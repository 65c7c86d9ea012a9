"""Mutable document/graph catalog over immutable DataFrames.

The reference is an OLTP-ish mutable store (save / update / remove with
cascades — reference src/mongraphMongoosePlugin.coffee:34-61).  Spark
DataFrames are immutable, so mutability lives in a small driver-side staging
layer (plain Python rows), and Spark DataFrames are *derived views* rebuilt
lazily when a version counter moves.  Reads therefore always see their own
writes; the analytic operators never know the difference.

Two store flavors share one read interface:

- :class:`MutableCatalog` — driver-side staging, for the reference's OLTP
  surface (fixture-scale; every mutation is O(1) driver work).
- :class:`BulkGraph` — wraps pre-existing DataFrames (parquet scans, the
  derived TPC-H graph, 100 TB tables).  Mutations are rejected; traversal /
  populate / BFS run fully distributed.

At cluster scale the staging layer would be replaced by a transactional table
format (Delta/Iceberg); the interface below is deliberately format-agnostic.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("_id", T.StringType(), False),
        T.StructField("_collection", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.LongType(), False),
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("_from", T.StringType(), True),
        T.StructField("_to", T.StringType(), True),
        T.StructField("_created_at", T.LongType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _stringify_props(props: dict[str, Any] | None) -> dict[str, str] | None:
    if props is None:
        return None
    out = {}
    for k, v in props.items():
        if v is None:
            continue
        if isinstance(v, bool):
            out[k] = "true" if v else "false"
        else:
            out[k] = str(v)
    return out


class GraphStore:
    """Read interface every operator is written against."""

    spark: SparkSession

    def nodes_df(self) -> DataFrame:
        raise NotImplementedError

    def edges_df(self) -> DataFrame:
        raise NotImplementedError

    def documents_df(self, collection: str) -> DataFrame:
        raise NotImplementedError

    def collection_names(self) -> list[str]:
        raise NotImplementedError


class BulkGraph(GraphStore):
    """Immutable store over existing DataFrames (the scale path)."""

    def __init__(
        self,
        spark: SparkSession,
        nodes: DataFrame,
        edges: DataFrame,
        documents: dict[str, DataFrame] | None = None,
    ) -> None:
        self.spark = spark
        self._nodes = nodes
        self._edges = edges
        self._documents = dict(documents or {})

    def nodes_df(self) -> DataFrame:
        return self._nodes

    def edges_df(self) -> DataFrame:
        return self._edges

    def documents_df(self, collection: str) -> DataFrame:
        return self._documents[collection]

    def collection_names(self) -> list[str]:
        return list(self._documents)


class MutableCatalog(GraphStore):
    """Driver-side staging store with derived, versioned Spark views.

    Documents are Python dicts keyed by ``_id``; nodes/edges are dicts keyed
    by ``node_id`` / ``rel_id``.  ``*_df()`` rebuilds a Spark DataFrame only
    when the corresponding version counter has moved since the last build
    (read-your-writes without re-shipping unchanged data).
    """

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._docs: dict[str, dict[str, dict[str, Any]]] = {}
        self._doc_schemas: dict[str, T.StructType] = {}
        self._nodes: dict[int, dict[str, Any]] = {}
        self._edges: dict[int, dict[str, Any]] = {}
        self._node_seq = itertools.count(1)  # tests assert _node_id > 0
        self._rel_seq = itertools.count(1)
        self._version = {"nodes": 0, "edges": 0}
        self._doc_version: dict[str, int] = {}
        self._df_cache: dict[str, tuple[int, DataFrame]] = {}

    # -- registration -------------------------------------------------------

    def register_collection(self, name: str, schema: T.StructType | None = None) -> None:
        self._docs.setdefault(name, {})
        self._doc_version.setdefault(name, 0)
        if schema is not None:
            self._doc_schemas[name] = schema

    def collection_names(self) -> list[str]:
        return list(self._docs)

    # -- document mutations --------------------------------------------------

    def upsert_document(self, collection: str, doc: dict[str, Any]) -> dict[str, Any]:
        self.register_collection(collection)
        self._docs[collection][doc["_id"]] = doc
        self._doc_version[collection] += 1
        return doc

    def get_document(self, collection: str, _id: str) -> dict[str, Any] | None:
        return self._docs.get(collection, {}).get(_id)

    def delete_document(self, collection: str, _id: str) -> None:
        if self._docs.get(collection, {}).pop(_id, None) is not None:
            self._doc_version[collection] += 1

    def iter_documents(self, collection: str) -> Iterable[dict[str, Any]]:
        return self._docs.get(collection, {}).values()

    # -- node mutations ------------------------------------------------------

    def next_node_id(self) -> int:
        return next(self._node_seq)

    def upsert_node(
        self, node_id: int, _id: str, collection: str, props: dict[str, Any] | None = None
    ) -> dict[str, Any]:
        row = {
            "node_id": node_id,
            "_id": _id,
            "_collection": collection,
            "props": dict(props or {}),
        }
        self._nodes[node_id] = row
        self._version["nodes"] += 1
        return row

    def get_node(self, node_id: int) -> dict[str, Any] | None:
        return self._nodes.get(node_id)

    def find_node_by_document(self, collection: str, _id: str) -> dict[str, Any] | None:
        for row in self._nodes.values():
            if row["_id"] == _id and row["_collection"] == collection:
                return row
        return None

    def delete_node(self, node_id: int, include_relationships: bool = True) -> None:
        if self._nodes.pop(node_id, None) is not None:
            self._version["nodes"] += 1
        if include_relationships:
            doomed = [
                rid for rid, e in self._edges.items() if e["src"] == node_id or e["dst"] == node_id
            ]
            for rid in doomed:
                del self._edges[rid]
            if doomed:
                self._version["edges"] += 1

    def node_count(self) -> int:
        return len(self._nodes)

    # -- edge mutations ------------------------------------------------------

    def next_rel_id(self) -> int:
        return next(self._rel_seq)

    def insert_edge(
        self,
        src: int,
        dst: int,
        type_: str,
        props: dict[str, Any] | None = None,
        _from: str | None = None,
        _to: str | None = None,
        _created_at: int | None = None,
    ) -> dict[str, Any]:
        rid = self.next_rel_id()
        row = {
            "rel_id": rid,
            "src": src,
            "dst": dst,
            "type": type_,
            "_from": _from,
            "_to": _to,
            "_created_at": _created_at,
            "props": dict(props or {}),
        }
        self._edges[rid] = row
        self._version["edges"] += 1
        return row

    def delete_edges(self, rel_ids: Iterable[int]) -> int:
        n = 0
        for rid in list(rel_ids):
            if self._edges.pop(rid, None) is not None:
                n += 1
        if n:
            self._version["edges"] += 1
        return n

    def get_edge(self, rel_id: int) -> dict[str, Any] | None:
        return self._edges.get(rel_id)

    def iter_edges(self) -> Iterable[dict[str, Any]]:
        return self._edges.values()

    def edge_count(self) -> int:
        return len(self._edges)

    # -- derived Spark views --------------------------------------------------

    def nodes_df(self) -> DataFrame:
        return self._cached_df("nodes", self._version["nodes"], self._build_nodes_df)

    def edges_df(self) -> DataFrame:
        return self._cached_df("edges", self._version["edges"], self._build_edges_df)

    def documents_df(self, collection: str) -> DataFrame:
        key = f"docs:{collection}"
        version = self._doc_version.get(collection, 0)
        return self._cached_df(key, version, lambda: self._build_docs_df(collection))

    def _cached_df(self, key: str, version: int, builder) -> DataFrame:
        hit = self._df_cache.get(key)
        if hit is not None and hit[0] == version:
            return hit[1]
        df = builder()
        self._df_cache[key] = (version, df)
        return df

    def _build_nodes_df(self) -> DataFrame:
        rows = [
            (r["node_id"], r["_id"], r["_collection"], _stringify_props(r["props"]))
            for r in self._nodes.values()
        ]
        return self.spark.createDataFrame(rows, schema=NODE_SCHEMA)

    def _build_edges_df(self) -> DataFrame:
        rows = [
            (
                r["rel_id"],
                r["src"],
                r["dst"],
                r["type"],
                r["_from"],
                r["_to"],
                r["_created_at"],
                _stringify_props(r["props"]),
            )
            for r in self._edges.values()
        ]
        return self.spark.createDataFrame(rows, schema=EDGE_SCHEMA)

    def _build_docs_df(self, collection: str) -> DataFrame:
        docs = list(self._docs.get(collection, {}).values())
        schema = self._doc_schemas.get(collection)
        if schema is None:
            raise ValueError(
                f"collection {collection!r} needs an explicit schema to derive a DataFrame"
            )
        rows = [tuple(_extract_path(d, f.name) for f in schema.fields) for d in docs]
        return self.spark.createDataFrame(rows, schema=schema)


def _extract_path(doc: dict[str, Any], field: str) -> Any:
    """Fetch a possibly-nested value; nested struct fields come back as dicts."""
    val = doc.get(field)
    if isinstance(val, dict):
        return val
    return val
