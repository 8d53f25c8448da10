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
