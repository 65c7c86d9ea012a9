"""Populate: the cross-store enrichment / semi join (SURVEY.md §2.4).

The reference loads, per graph result row, each endpoint document with an
N+1 ``findOne`` (reference src/processtools.coffee:119-256) and *drops the
whole relationship row* when an endpoint fails the document predicate or the
collection filter.  Here that is one declarative join pipeline:

    edges ⋈ D[from_coll] ⋈ D[to_coll]

with the document predicate pushed down as a ``filter`` on each document
DataFrame *before* the join (Catalyst pushes it into the scan), and
inner-join semantics giving the drop-if-no-match behavior for free.
Dimension-sized document sets get broadcast automatically by Catalyst/AQE;
``F.broadcast`` is applied when the store declares a side small.

The reference document itself is exempt from the predicate
(reference src/processtools.coffee:171,194,201).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongraph_spark.catalog import GraphStore
from mongraph_spark.mongo_expr import mongo_to_column


def split_locator(col: Column) -> tuple[Column, Column]:
    """Split a ``"<collection>:<_id>"`` composite (extractCollectionAndId,
    reference src/processtools.coffee:56-57)."""
    return F.split(col, ":", 2).getItem(0), F.split(col, ":", 2).getItem(1)


def with_endpoint_locators(edges: DataFrame) -> DataFrame:
    fc, fi = split_locator(F.col("_from"))
    tc, ti = split_locator(F.col("_to"))
    return (
        edges.withColumn("_from_collection", fc)
        .withColumn("_from_id", fi)
        .withColumn("_to_collection", tc)
        .withColumn("_to_id", ti)
    )


def _filtered_docs(
    store: GraphStore,
    collection: str,
    where_document: dict[str, Any] | None,
    reference_id: str | None,
) -> DataFrame:
    df = store.documents_df(collection)
    if where_document:
        cols = set(df.columns)

        def resolve(field: str) -> Column:
            # Mongo semantics: a predicate on a field the document lacks
            # simply doesn't match — never an analysis error.
            root = field.split(".")[0]
            if root not in cols:
                return F.lit(None).cast("string")
            return F.col(field)

        pred = mongo_to_column(where_document, resolver=resolve)
        if reference_id is not None:
            # the anchor document always survives the predicate
            pred = pred | (F.col("_id") == F.lit(reference_id))
        df = df.filter(pred)
    return df


def semi_populate(
    store: GraphStore,
    edges: DataFrame,
    where_document: dict[str, Any] | None = None,
    collections: list[str] | None = None,
    reference_id: str | None = None,
) -> DataFrame:
    """Distributed drop-semantics populate: keep only edges whose *both*
    endpoints exist in their (predicate-filtered) collections.

    ``collections`` restricts which collections may appear at the non-anchor
    endpoint (the reference's ``options.collection`` skip,
    src/processtools.coffee:173,196) — endpoints in other collections fail.

    Plan shape: exactly two left-semi joins (one per endpoint side) against a
    single union of (collection, _id) key pairs — not one join per collection.
    Semi joins keep the edge schema intact; the key-pair side is two narrow
    columns, so it broadcasts cheaply even when document tables are huge.
    """
    e = with_endpoint_locators(edges)
    touched = collections or store.collection_names()

    keys: DataFrame | None = None
    for coll in touched:
        part = _filtered_docs(store, coll, where_document, reference_id).select(
            F.lit(coll).alias("__coll"), F.col("_id").alias("__doc_id")
        )
        keys = part if keys is None else keys.unionByName(part)
    if keys is None:
        return edges.limit(0)

    for side in ("_from", "_to"):
        cond = (F.col(f"{side}_collection") == keys["__coll"]) & (
            F.col(f"{side}_id") == keys["__doc_id"]
        )
        if reference_id is not None:
            # the anchor document endpoint always survives
            anchor_side = e.filter(F.col(f"{side}_id") == F.lit(reference_id))
            e = anchor_side.unionByName(
                e.filter(F.col(f"{side}_id") != F.lit(reference_id)).join(
                    keys, cond, "left_semi"
                )
            )
        else:
            e = e.join(keys, cond, "left_semi")
    return e.drop("_from_collection", "_from_id", "_to_collection", "_to_id")


def attach_endpoint_documents(
    store: GraphStore,
    edges: DataFrame,
    collections: list[str] | None = None,
) -> DataFrame:
    """Attach both endpoint documents to a (possibly mixed-collection) edge
    set in ONE declarative plan — the batched replacement for the reference's
    per-relationship ``findOne`` pair (src/processtools.coffee:184-212).

    Collections have heterogeneous schemas, so each document is carried as a
    JSON-encoded struct in a single unioned ``(collection, _id, doc_json)``
    side, joined once per endpoint side (left join: an edge whose endpoint
    document is missing keeps the row with a null doc, matching the
    point-lookup behavior).  The join side is |docs| rows of three narrow
    columns regardless of collection count — no per-row lookups, no
    per-collection join fan-out, and the same plan runs distributed on a
    BulkGraph store where a driver-side lookup would not work at all.
    """
    e = with_endpoint_locators(edges)
    touched = collections or store.collection_names()

    docs: DataFrame | None = None
    for coll in touched:
        d = store.documents_df(coll)
        part = d.select(
            F.lit(coll).alias("__coll"),
            F.col("_id").alias("__doc_id"),
            F.to_json(F.struct(*[F.col(c) for c in d.columns])).alias("__doc_json"),
        )
        docs = part if docs is None else docs.unionByName(part)
    if docs is None:
        out = e.withColumn("from_doc", F.lit(None).cast("string"))
        out = out.withColumn("to_doc", F.lit(None).cast("string"))
    else:
        fdocs = docs.select(
            F.col("__coll").alias("__f_coll"),
            F.col("__doc_id").alias("__f_id"),
            F.col("__doc_json").alias("from_doc"),
        )
        tdocs = docs.select(
            F.col("__coll").alias("__t_coll"),
            F.col("__doc_id").alias("__t_id"),
            F.col("__doc_json").alias("to_doc"),
        )
        out = e.join(
            fdocs,
            (F.col("_from_collection") == F.col("__f_coll"))
            & (F.col("_from_id") == F.col("__f_id")),
            "left",
        ).join(
            tdocs,
            (F.col("_to_collection") == F.col("__t_coll"))
            & (F.col("_to_id") == F.col("__t_id")),
            "left",
        ).drop("__f_coll", "__f_id", "__t_coll", "__t_id")
    return out.drop("_from_collection", "_from_id", "_to_collection", "_to_id")


def enrich_edges(
    store: GraphStore,
    edges: DataFrame,
    from_collection: str,
    to_collection: str,
    where_from: dict[str, Any] | None = None,
    where_to: dict[str, Any] | None = None,
    reference_id: str | None = None,
    from_prefix: str = "from_",
    to_prefix: str = "to_",
) -> DataFrame:
    """Typed enrichment join for homogeneous edge sets: attach both endpoint
    documents' columns (prefixed).  Inner joins ⇒ reference drop semantics
    (an endpoint failing its predicate drops the whole edge row).

    Per-side predicates generalize the reference's single ``where.document``
    (pass the same dict to both for exact reference behavior)."""
    e = with_endpoint_locators(edges).filter(
        (F.col("_from_collection") == from_collection)
        & (F.col("_to_collection") == to_collection)
    )
    fdocs = _filtered_docs(store, from_collection, where_from, reference_id)
    tdocs = _filtered_docs(store, to_collection, where_to, reference_id)
    fdocs = fdocs.select([F.col(c).alias(f"{from_prefix}{c}") for c in fdocs.columns])
    tdocs = tdocs.select([F.col(c).alias(f"{to_prefix}{c}") for c in tdocs.columns])
    out = e.join(fdocs, e["_from_id"] == fdocs[f"{from_prefix}_id"], "inner")
    out = out.join(tdocs, out["_to_id"] == tdocs[f"{to_prefix}_id"], "inner")
    return out.drop("_from_collection", "_from_id", "_to_collection", "_to_id")
