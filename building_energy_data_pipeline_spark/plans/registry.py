"""Query registry — the driver-facing catalog of engine capabilities.

Each :class:`QuerySpec` pairs a Spark DataFrame program with the
ANSI-SQL oracle DuckDB runs on the same parquet tables (``None`` for
non-SQL-expressible operators → rows-only check). Query modules
(``queries``, ``training_queries``, ...) register specs at import time
via the :func:`query` decorator; ``plans/__init__.py`` imports them
all so ``REGISTRY`` is complete after ``import ...plans``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check


REGISTRY: dict[str, QuerySpec] = {}

#: queries timed by bench.py
HEADLINE: list[str] = []


def query(name: str, oracle: str | None, headline: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn.__doc__ or "", fn, oracle)
        if headline:
            HEADLINE.append(name)
        return fn

    return deco
