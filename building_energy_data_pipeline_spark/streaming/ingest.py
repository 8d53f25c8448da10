"""Structured Streaming ingestion (SURVEY §2.11, §7 phase 7).

The reference is batch-only; its ±1 h overlap tolerance
(``src/data_loading/data_loader.py:389``) and UNIQUE constraint
(``:681-728``) are the batch approximations of what streaming states
directly:

- late-data tolerance  → ``withWatermark(ts, "1 hour")``
- unique (ts, building_id, meter) → ``dropDuplicatesWithinWatermark``
- idempotent file loads → file-source exactly-once tracking + the
  parquet sink's checkpointed commit log

Scale: state held per key only within the watermark horizon; the file
source lists incrementally (``maxFilesPerTrigger`` throttles a 100 TB
backlog); every transform below is also valid on a batch DataFrame —
the same logical plan serves both (tested that way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the long fact-table schema (SURVEY §1.2 `raw`)
RAW_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("building_id", T.StringType()),
        T.StructField("meter", T.StringType()),
        T.StructField("meter_reading", T.DoubleType()),
    ]
)

UNIQUE_KEYS = ["timestamp", "building_id", "meter"]
TOLERANCE = "1 hour"


def read_meter_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of raw-shaped records. Spark tracks seen
    files in the checkpoint — the streaming form of the reference's
    skip-if-exists download gate (``zenodo_client.py:44-50``)."""
    reader = spark.readStream.schema(RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def dedup_stream(df: DataFrame, tolerance: str = TOLERANCE) -> DataFrame:
    """The streaming overlap gate: watermark bounds how late a record
    may arrive (the reference's ±1 h), and duplicates on the unique
    key are dropped while their key is inside the watermark — the
    streaming equivalent of C5's UNIQUE constraint + J1's gate.

    State size = keys seen within the horizon, evicted by watermark —
    bounded regardless of stream length.
    """
    return df.withWatermark("timestamp", tolerance).dropDuplicatesWithinWatermark(
        UNIQUE_KEYS
    )


def windowed_rollup(
    df: DataFrame,
    window: str = "1 hour",
    tolerance: str = TOLERANCE,
) -> DataFrame:
    """Tumbling-window per-building/meter aggregate — the streaming
    twin of the batch hourly rollup (plans/queries.py q25).

    Output: window_start, building_id, meter, n_readings,
    sum_reading, avg_reading. Late rows beyond the watermark are
    dropped; on-time late rows update their window (append mode emits
    a window once its watermark passes).
    """
    return (
        df.withWatermark("timestamp", tolerance)
        .groupBy(
            F.window("timestamp", window).alias("w"),
            "building_id",
            "meter",
        )
        .agg(
            F.count("*").alias("n_readings"),
            F.sum("meter_reading").alias("sum_reading"),
            F.avg("meter_reading").alias("avg_reading"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "building_id",
            "meter",
            "n_readings",
            "sum_reading",
            "avg_reading",
        )
    )


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Checkpointed parquet sink. ``availableNow`` drains the backlog
    then stops — the batch-compatible trigger used in tests and
    backfills; drop it for a continuous 24/7 ingest."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_idempotent(
    df: DataFrame,
    path: str,
    table_type: str,
    unique_keys: list,
    checkpoint: str,
    tolerance: str = TOLERANCE,
    partition_by: list | None = None,
    available_now: bool = True,
):
    """``foreachBatch`` sink: every micro-batch passes through the
    BATCH idempotent loader (overlap gate → dedup-on-key → atomic
    partitioned append, ``etl.loader.write_idempotent``) — one
    loading policy for both execution modes, which is the §3.1
    contract the reference enforces with staging tables + UNIQUE
    constraints.

    Exactly-once: the checkpoint records committed batch ids, so a
    retried batch re-enters ``foreachBatch`` — and the overlap gate
    then rejects it against the already-written rows, making the
    replay a no-op instead of a duplicate (gate-as-idempotence, the
    same property the reference gets from its probe-read check,
    ``data_loader.py:173-177``).

    Scale: the gate's semi-join prunes to the batch's key/time bounds
    before touching the existing table; partition pruning on
    ``partition_by`` keeps the existing-side scan to the touched
    partitions.
    """
    import os

    from ..etl.loader import write_idempotent

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = (
            spark.read.parquet(path) if os.path.isdir(path) else None
        )
        write_idempotent(
            batch_df,
            path,
            table_type,
            list(unique_keys),
            existing=existing,
            tolerance=tolerance,
            partition_by=list(partition_by) if partition_by else None,
        )

    writer = df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
