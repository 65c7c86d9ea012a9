"""Document ingestion sources: load external files into the engine.

The reference's only "source" is a live MongoDB collection (documents arrive
via Mongoose models); the Spark-native analog is file ingestion — JSON lines,
CSV, or parquet — either into the OLTP catalog (small, mutable, mirrored
into the graph on save, reference src/mongraphMongoosePlugin.coffee:43-61)
or as a bulk DataFrame for analytics mode (any scale; schema-on-read, the
``_id`` key derived deterministically when absent).

Scale notes: bulk ingestion is a pure scan — no driver materialization, and
the derived ``_id`` is a projection, so Catalyst still prunes/pushes through
it.  OLTP ingestion intentionally collects: it feeds the mutable staging
catalog, which is a driver-side structure by design (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = {"json", "csv", "parquet"}


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    schema: str | None = None,
    id_column: str | None = None,
    **options,
) -> DataFrame:
    """Read an external file into a bulk document DataFrame.

    Guarantees a 24-hex ``_id`` column (the cross-store join key,
    SURVEY.md §1.2): taken from ``id_column`` when given, else derived as
    ``substr(md5(to_json(struct(*))), 1, 24)`` — deterministic per row
    content, computable in any engine.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported source format: {fmt!r} (use {sorted(_FORMATS)})")
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if not schema:
            options.setdefault("inferSchema", "true")
    df = reader.options(**options).format(fmt).load(path)
    if "_id" in df.columns:
        return df
    if id_column is not None:
        src = F.col(id_column).cast("string")
    else:
        src = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.withColumn("_id", F.substring(F.md5(src), 1, 24))


def schema_from_struct(name: str, struct) -> "CollectionSchema":
    """Infer a CollectionSchema (registration metadata) from a Spark schema."""
    from pyspark.sql import types as T

    from mongraph_spark.schema import CollectionSchema, FieldSpec

    def to_spec(dtype) -> FieldSpec:
        if isinstance(dtype, T.StructType):
            return FieldSpec(fields={f.name: to_spec(f.dataType) for f in dtype.fields})
        if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
            return FieldSpec(type=int)
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return FieldSpec(type=float)
        if isinstance(dtype, T.BooleanType):
            return FieldSpec(type=bool)
        return FieldSpec(type=str)

    return CollectionSchema(
        name=name,
        fields={f.name: to_spec(f.dataType) for f in struct.fields if f.name != "_id"},
    )


def ingest_collection(engine, collection: str, path: str, fmt: str = "json", **options) -> int:
    """Load a file into the OLTP catalog as saved documents (mirror nodes
    created by the save hook, like every reference document).  Returns the
    number of documents ingested."""
    df = read_documents(engine.spark, path, fmt=fmt, **options)
    if collection not in getattr(engine, "_schemas", {}):
        engine.register_collection(schema_from_struct(collection, df.schema))
    n = 0
    for row in df.toLocalIterator():
        doc = {k: v for k, v in row.asDict(recursive=True).items() if k != "_id"}
        engine.create_document(collection, doc).save()
        n += 1
    return n


def export_collection(
    engine, collection: str, path: str, fmt: str = "json", mode: str = "overwrite"
) -> None:
    """Write a collection's current state out as JSON lines / CSV / parquet."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported sink format: {fmt!r} (use {sorted(_FORMATS)})")
    df = engine.store.documents_df(collection)
    if fmt == "csv":
        # CSV can't hold nested types; stringify map/struct/array columns
        for name, dtype in df.dtypes:
            if dtype.startswith(("map", "struct", "array")):
                df = df.withColumn(name, F.to_json(F.col(name)))
    df.write.mode(mode).format(fmt).save(path)
