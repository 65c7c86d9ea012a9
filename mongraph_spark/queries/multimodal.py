"""Multimodal column handling (training-data pipeline scope): image/audio/
video as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries and the driver tables have no
binary columns, so this module (a) synthesizes deterministic binary payloads
in-query from the documents table (mock "images": repeated md5 bytes; mock
"videos": concatenated per-frame hashes), and (b) keeps the *Spark-side
plumbing real* — binary schema, metadata structs, mapInPandas batch
iteration, partition-size control — while the actual codec step is either a
deterministic fake (oracle-checkable) or a clearly-marked stub that raises
``NotImplementedError`` until a real library (PIL/ffmpeg) is present.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
materialize on the driver; metadata-only predicates (width/height/codec)
are plain columns, so Catalyst prunes/pushes them without touching bytes;
per-file size accounting is a groupBy over metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import read_table, scale_out

FRAME_COUNT = 8  # mock "video" frames per document
FRAME_STEP = 3  # sample every 3rd frame


def _with_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata.

    payload = unhex(md5(text)) repeated (n_chars % 4 + 1) times — an opaque
    blob whose size varies per row; metadata mimics an image header.
    """
    reps = (F.col("n_chars") % 4 + 1).cast("int")
    hex_payload = F.expr("repeat(md5(text), n_chars % 4 + 1)")
    return docs.select(
        "doc_id",
        F.to_binary(hex_payload, F.lit("hex")).alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.lit("mock/raw").alias("codec"),
            reps.alias("reps"),
        ).alias("meta"),
    )


# -- feature extraction over binary via mapInPandas -----------------------------------

_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_hex string, byte_sum long, width int, height int"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: length, head bytes, byte-sum.

    This is where a real decoder would run (PIL.Image.open on the bytes);
    the computation below is the deterministic stand-in that keeps the
    batch shape, schema, and byte access patterns identical.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                "byte_sum": payloads.map(lambda b: int(sum(bytes(b)))).astype("int64"),
                "width": pdf["width"],
                "height": pdf["height"],
            }
        )


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scale_out(read_table(spark, sf_dir, "documents"))
    media = _with_payload(docs).select(
        "doc_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return media.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


# oracle: byte_sum of unhex(md5 repeated) = reps * sum over md5 hex pairs
ORACLE_IMAGE_FEATURES = """
WITH hx AS (
  SELECT doc_id, md5(text) AS h, (n_chars % 4 + 1) AS reps,
         CAST(n_chars % 640 + 16 AS INTEGER) AS width,
         CAST(n_chars % 480 + 16 AS INTEGER) AS height
  FROM documents
)
SELECT doc_id,
       CAST(16 * reps AS BIGINT) AS n_bytes,
       substr(h, 1, 8) AS head_hex,
       CAST(reps * list_sum(list_transform(range(0, 16),
           i -> CAST(('0x' || substr(h, 2 * i + 1, 2)) AS INTEGER))) AS BIGINT) AS byte_sum,
       width, height
FROM hx
"""


# -- metadata-only filtering (no byte access — pruning showcase) -----------------------


def mm_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = _with_payload(docs)
    return (
        media.filter(
            (F.col("meta.width") > 320) & (F.col("meta.codec") == "mock/raw")
        )
        .groupBy(F.col("meta.reps").alias("reps"))
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
        )
    )


ORACLE_METADATA_FILTER = """
SELECT (n_chars % 4 + 1) AS reps,
       count(*) AS n_assets,
       CAST(sum(16 * (n_chars % 4 + 1)) AS BIGINT) AS total_bytes
FROM documents
WHERE (n_chars % 640 + 16) > 320
GROUP BY 1
"""


# -- frame sampling: "video" = N frames; take every k-th ------------------------------

_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampler: a real implementation would seek into the container
    (ffmpeg); the mock derives per-frame hashes from the doc hash."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
        for doc_id, h in zip(pdf["doc_id"], pdf["base_hash"]):
            for idx in range(0, FRAME_COUNT, FRAME_STEP):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_hash"].append(hashlib.md5(f"{h}:{idx}".encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_hash": pd.Series(out["frame_hash"], dtype="object"),
            }
        )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scale_out(read_table(spark, sf_dir, "documents"))
    videos = docs.select("doc_id", F.md5("text").alias("base_hash"))
    return videos.mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)


ORACLE_FRAME_SAMPLE = f"""
SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       md5(md5(text) || ':' || CAST(f AS VARCHAR)) AS frame_hash
FROM documents, range(0, {FRAME_COUNT}, {FRAME_STEP}) t(f)
"""


# -- real-decoder stubs (plumbing ready; library absent in this container) --------------


def decode_image(payload: bytes, codec: str):  # pragma: no cover - stub
    """Decode an image payload.  STUB: requires PIL, not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL; this container has no image libs — "
            "the mapInPandas plumbing above is real, swap _extract_features' "
            "fake with PIL.Image.open(io.BytesIO(payload))"
        ) from exc


def decode_audio(payload: bytes, codec: str):  # pragma: no cover - stub
    """Decode an audio payload.  STUB: requires soundfile/ffmpeg."""
    raise NotImplementedError(
        "audio decoding requires soundfile/ffmpeg; not present in this container"
    )


QUERIES = {
    "mm_image_features": mm_image_features,
    "mm_metadata_filter": mm_metadata_filter,
    "mm_frame_sample": mm_frame_sample,
}

ORACLES = {
    "mm_image_features": ORACLE_IMAGE_FEATURES,
    "mm_metadata_filter": ORACLE_METADATA_FILTER,
    "mm_frame_sample": ORACLE_FRAME_SAMPLE,
}
