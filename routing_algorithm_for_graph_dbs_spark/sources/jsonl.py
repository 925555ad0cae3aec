"""JSON-Lines source/sink — the lingua franca of training-data exchange.

Web-scale corpora move between pipelines as newline-delimited JSON
(one document object per line, gzip-compressed in practice). Spark's
json reader handles it natively; the two disciplines this module pins:

- **Schema on read, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types — and
  guesses differently per snapshot (a batch whose ``lang`` is all-null
  infers string vs the next batch's void). Callers MUST pass the schema;
  corrupt lines land in ``_corrupt_record`` under PERMISSIVE mode
  instead of killing the job, and can be counted/quarantined.

- **Partitioned layout for pruning.** ``write_jsonl(partition_by=...)``
  lays files out hive-style (``source=web/part-*.json.gz``) so an
  equality filter on the partition column prunes whole directories at
  planning time — the same partition-pruning contract as the parquet
  layout (asserted in tests via ``inputFiles``).

JSONL stays the interchange format; analytics should land in parquet
(columnar pruning, stats). ``jsonl_to_parquet`` is that one-hop
ingestion, preserving the partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an EXPLICIT schema (compressed
    files are handled transparently by extension). PERMISSIVE mode: a
    malformed line yields a row of nulls; pass ``keep_corrupt=True`` to
    retain the raw line in ``_corrupt_record`` for quarantining."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if keep_corrupt:
        from pyspark.sql.types import StringType

        schema = schema.add("_corrupt_record", StringType())
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "gzip",
    mode: str = "error",
) -> None:
    """Write as JSONL, hive-partitioned by ``partition_by`` (low-
    cardinality columns only — every distinct tuple is a directory)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def corrupt_line_stats(df: DataFrame) -> tuple[int, int]:
    """(clean_rows, corrupt_rows) for a frame read with
    ``keep_corrupt=True`` — one scan, conditional count.

    Spark refuses aggregates that reference ONLY ``_corrupt_record`` on a
    raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    the documented workaround is to materialize first, so the frame is
    persisted for the count and released after."""
    df.persist()
    try:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_corrupt_record").alias("bad"),
        ).collect()[0]
    finally:
        df.unpersist()
    return row["n"] - row["bad"], row["bad"]


def jsonl_to_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    schema: StructType | str,
    partition_by: list[str] | None = None,
) -> None:
    """One-hop ingestion: JSONL interchange -> parquet analytics layout,
    preserving (or adding) the partition layout."""
    df = read_jsonl(spark, src_path, schema)
    w = df.write.mode("error")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dst_path)
