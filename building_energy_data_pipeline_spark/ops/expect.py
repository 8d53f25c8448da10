"""Declarative data-contract checks (dbt-test / Great-Expectations
style), compiled to single-pass aggregates.

The reference validates loads imperatively (row-count echo +
uniqueness probe in ``data_loader.py`` / ``etl/loader.py:148``'s
``validate_unique`` twin); a lakehouse runs a CONTRACT per table —
uniqueness, nullability, accepted values, ranges, referential
integrity — and routes the violation counts to monitoring. Design
rules:

- every row-predicate check on the same table folds into ONE scan
  (:func:`violation_counts` stacks conditional sums — adding a check
  is free, the scan count is constant);
- :func:`unique_violations` is the one aggregate identity
  ``count(*) − count(distinct key)`` (excess rows beyond the first
  per key), map-side partial-aggregated;
- :func:`fk_violations` is a LEFT ANTI count against the (usually
  broadcastable) parent key set — at warehouse scale the
  partition-pruned form of "orphan scan".

Violating predicates are written from the VIOLATION's point of view
(TRUE = bad row) so the counts read directly as defect totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> str:
    return f"{col} IS NULL"


def accepted(col: str, values: list[str]) -> str:
    quoted = ", ".join(f"'{v}'" for v in values)
    return f"({col} IS NULL OR {col} NOT IN ({quoted}))"


def in_range(col: str, lo, hi) -> str:
    return f"({col} IS NULL OR NOT ({col} BETWEEN {lo} AND {hi}))"


def violation_counts(
    df: DataFrame, named_preds: dict[str, str]
) -> DataFrame:
    """``(chk, n_violations)`` for every named violation predicate,
    in ONE scan of ``df``."""
    aggs = [
        F.expr(
            f"cast(sum(CASE WHEN {p} THEN 1 ELSE 0 END) as bigint)"
        ).alias(name)
        for name, p in named_preds.items()
    ]
    row = df.agg(*aggs)
    stacked = ", ".join(f"'{n}', {n}" for n in named_preds)
    return row.select(
        F.expr(
            f"stack({len(named_preds)}, {stacked})"
            " as (chk, n_violations)"
        )
    )


def unique_violations(
    df: DataFrame, cols: list[str], name: str = "unique"
) -> DataFrame:
    """Rows in excess of one per key: ``count(*) − count(distinct
    key)`` — zero iff ``cols`` is a key."""
    key = ", ".join(cols)
    return df.agg(
        F.expr(
            f"cast(count(*) - count(distinct struct({key}))"
            " as bigint)"
        ).alias("n_violations")
    ).select(F.lit(name).alias("chk"), "n_violations")


def fk_violations(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str = "fk",
) -> DataFrame:
    """Child rows with no matching parent (orphans)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.count("*").alias("n_violations")
    ).select(F.lit(name).alias("chk"), "n_violations")
