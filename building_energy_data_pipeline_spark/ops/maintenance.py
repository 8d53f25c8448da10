"""Table maintenance & health (SURVEY §2.10 C8/C10).

The reference's VACUUM / REINDEX / CLUSTER and pg_stat health probes
(``src/postgres_managing/postgres_manager.py:634-654,788-920``) are
PostgreSQL-specific; their Parquet-native counterparts are the two
things that actually degrade a file-based table at 100 TB:

- **small files** (per-trigger streaming commits, over-partitioned
  writes) → fixed by :func:`compact`;
- **partition skew** (hot keys) → surfaced by :func:`table_health`,
  fixed by re-layout.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

#: compaction target — matches the default parquet row-group sweet spot
TARGET_FILE_BYTES = 128 * 1024 * 1024
SMALL_FILE_BYTES = 16 * 1024 * 1024


def _data_files(path: str) -> list[tuple[str, int]]:
    out = []
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                full = os.path.join(dirpath, f)
                out.append((full, os.path.getsize(full)))
    return out


@dataclass
class TableHealth:
    """C8 reimagined: the stats a Parquet table can actually act on."""

    n_files: int
    total_bytes: int
    avg_file_bytes: int
    small_files: int  # < SMALL_FILE_BYTES
    max_file_bytes: int
    partitions: dict[str, int]  # top-level partition dir → bytes
    skew_ratio: float  # max partition bytes / mean partition bytes


def table_health(path: str) -> TableHealth:
    """File-layout health from the filesystem alone (no Spark job) —
    the analogue of the reference's size/bloat queries, which also
    read only catalog metadata."""
    files = _data_files(path)
    sizes = [s for _, s in files]
    parts: dict[str, int] = {}
    for full, size in files:
        rel = os.path.relpath(full, path)
        top = rel.split(os.sep)[0] if os.sep in rel else "<root>"
        parts[top] = parts.get(top, 0) + size
    mean_part = (sum(parts.values()) / len(parts)) if parts else 0
    return TableHealth(
        n_files=len(files),
        total_bytes=sum(sizes),
        avg_file_bytes=int(sum(sizes) / len(sizes)) if sizes else 0,
        small_files=sum(1 for s in sizes if s < SMALL_FILE_BYTES),
        max_file_bytes=max(sizes, default=0),
        partitions=parts,
        skew_ratio=(max(parts.values()) / mean_part) if mean_part else 0.0,
    )


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    cluster_by: list[str] | None = None,
) -> int:
    """C10: small-file compaction — read, repartition to
    ceil(bytes/target), atomically rewrite. Returns the new file
    count.

    ``cluster_by`` additionally range-partitions AND sorts the
    rewrite on the given columns — the Parquet-native counterpart of
    the reference's ``CLUSTER``/``REINDEX``
    (``postgres_manager.py:1175-1191``): each output file then owns
    a narrow, disjoint key range, so parquet min/max footer stats
    skip whole files for selective predicates on those columns
    (file-level pruning is the poor man's index at 100 TB; without
    clustering every file spans the full key range and nothing
    skips).

    The rewrite goes through a sibling temp dir + rename, the
    Spark-native stand-in for VACUUM FULL's copy-and-swap (a direct
    overwrite of the dir being read would race the scan).
    """
    import shutil

    health = table_health(path)
    n = max(1, math.ceil(health.total_bytes / target_file_bytes))
    tmp = path.rstrip("/") + "._compacting"
    df = spark.read.parquet(path)
    if cluster_by:
        df = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(tmp)
    backup = path.rstrip("/") + "._precompact"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return len(_data_files(path))
