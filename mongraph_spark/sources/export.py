"""Corpus export sink: partitioned parquet layout for training-data output.

The reference's "sink" is a live database write; the Spark-native analog for
a corpus build is a partitioned parquet dataset:

    <root>/split=train/lang=en/part-*.parquet
    ...

Layout choices that matter at 100 TB:

- ``partitionBy(split, lang)`` → readers prune whole directories (a train-set
  scan never touches val/test files).
- a ``repartition`` on the partition columns BEFORE the write: without it,
  every write task holds one open file per output partition — T·P small
  files and T·P columnar writer buffers in memory; with it, each output
  partition is written by the few tasks that own its hash bucket.
- ``maxRecordsPerFile`` bounds file size so a hot partition (the dominant
  language) splits into parallel-readable chunks instead of one giant file.
- optional ``sortWithinPartitions`` gives parquet min/max row-group skipping
  on the sort key (doc_id range reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_corpus(
    df: DataFrame,
    root: str,
    partition_by: tuple[str, ...] = ("split", "lang"),
    sort_by: str | None = "doc_id",
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    out = df
    if partition_by:
        out = out.repartition(*[out[c] for c in partition_by])
        if sort_by is not None:
            out = out.sortWithinPartitions(sort_by)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_by)
        .parquet(root)
    )


def read_corpus(spark: SparkSession, root: str) -> DataFrame:
    """Re-open an exported corpus; partition columns come back as columns and
    filters on them prune directories before any file is opened."""
    return spark.read.parquet(root)
