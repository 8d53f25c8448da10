"""DDL generation + schema diff (SURVEY §2.9 T12–T14).

Mirrors ``SQLSchemaGenerator``
(``src/schema_generator/schema_analyzer.py:105-258``): header
comments, quoted column definitions with NOT NULL, optional primary
key, footer with per-column stats/recommendations; plus
``compare_table_schemas``
(``src/postgres_managing/postgres_manager.py:1038-1087``) as a
driver-side StructType diff.
"""

from __future__ import annotations

import re
from datetime import datetime
from pathlib import Path

from pyspark.sql import types as T

from .profiler import ColumnInfo


def derive_table_name(file_path: str | Path) -> str:
    """``_derive_table_name`` (``schema_analyzer.py:174-187``)."""
    base = Path(file_path).stem.lower()
    clean = re.sub(r"[^a-zA-Z0-9_]", "_", base)
    return f"tbl_{clean}" if clean[0].isdigit() else clean


def generate_ddl(
    columns: list[ColumnInfo],
    source_file: str | Path,
    table_name: str | None = None,
    primary_key: str | None = None,
    now: datetime | None = None,
) -> str:
    """T12: CREATE TABLE text with the reference's exact layout
    (``schema_analyzer.py:116-172,189-240``)."""
    src = Path(source_file)
    table = table_name or derive_table_name(src)
    stamp = (now or datetime.now()).strftime("%Y-%m-%d %H:%M:%S")
    parts = [
        f"-- Schema generated for {src.name}",
        f"-- Generated on {stamp}",
        f"-- Number of columns: {len(columns)}",
        "",
        "-- Table Definition",
        f'CREATE TABLE IF NOT EXISTS "{table}" (',
    ]
    defs = []
    for c in columns:
        d = f'    "{c.name}" {c.data_type}'
        if not c.nullable:
            d += " NOT NULL"
        defs.append(d)
    if primary_key:
        defs.append(f"    PRIMARY KEY ({primary_key})")
    parts.append(",\n".join(defs))
    parts.append(");")
    parts.extend(["", "-- Column Information:"])
    for c in columns:
        parts.extend(
            [
                f"-- {c.name}:",
                f"--   Type: {c.original_type} -> {c.data_type}",
                f"--   Nullable: {c.nullable}",
                f"--   Unique Values: {c.stats.get('unique_count')}",
                "--   Recommendations:",
            ]
        )
        for rec in c.metadata.get("recommendations", []):
            parts.append(f"--     * {rec}")
        parts.append("--")
    return "\n".join(parts)


def schema_diff(
    left: T.StructType, right: T.StructType
) -> dict[str, list]:
    """T14: ``compare_table_schemas`` semantics — J7's NOT-IN both
    directions plus J6's USING+type-mismatch join, computed
    driver-side on StructTypes (catalog metadata is small; no Spark
    job needed)."""
    lt = {f.name: f.dataType.simpleString() for f in left.fields}
    rt = {f.name: f.dataType.simpleString() for f in right.fields}
    return {
        "only_in_left": sorted(set(lt) - set(rt)),
        "only_in_right": sorted(set(rt) - set(lt)),
        "type_mismatch": sorted(
            (n, lt[n], rt[n]) for n in set(lt) & set(rt) if lt[n] != rt[n]
        ),
    }
