"""Sinks & format conversion (SURVEY §2.1 S10–S12, S15).

Directory-of-parts is the native table form (U2 note: ``coalesce(1)``
kills write parallelism); single-file export exists only as an
explicit utility for the reference's one-file contract
(``pd.concat`` merge, ``data_transformer.py:292-316``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """S10: Parquet sink (``save_parquet``, ``file_utils.py:168-171``)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """S11/S15: CSV sink. ``single_file=True`` reproduces the
    reference's one-file export (``convert_parquet_to_csv``,
    ``data_transformer.py:23-84``) — a deliberate parallelism
    sacrifice, only for small exports."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    parquet_path: str,
    compression: str = "gzip",
    header: bool = True,
) -> None:
    """S12: CSV→Parquet conversion (``csv_to_parquet_in_chunks``,
    ``file_utils.py:179-251``) — chunking is partitioning here, and
    the gzip option matches the reference default."""
    df = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(csv_path)
    )
    write_parquet(df, parquet_path, compression=compression)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSONL sink — the de-facto training-corpus interchange format
    (one JSON object per line; Spark's ``json`` sink IS
    line-delimited). Extends the reference's export surface
    (S11/S15, ``convert_parquet_to_csv`` / ``export_table_to_csv``)
    to the format LLM-data tooling actually consumes; gzip by
    default, matching the reference's compressed-conversion default
    (S12, ``file_utils.py:179-251``).

    Scale: a parallel directory-of-parts like every other sink here;
    gzip costs CPU but JSONL's redundancy makes it ~5× smaller on
    the wire — the right trade when the consumer is a downloader,
    not this engine (keep parquet for engine-side storage).
    """
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """ORC sink — the second columnar format Spark ships natively;
    interop surface for Hive-era warehouses the reference's
    PostgreSQL users may also feed. Same contract as
    :func:`write_parquet` (S10)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.orc(path)


def parquet_to_csv(
    spark: SparkSession,
    parquet_path: str,
    csv_path: str,
    header: bool = True,
    single_file: bool = True,
) -> None:
    """S11: Parquet→CSV export; single-file by default to match the
    reference's contract."""
    write_csv(
        spark.read.parquet(parquet_path),
        csv_path,
        header=header,
        single_file=single_file,
    )
