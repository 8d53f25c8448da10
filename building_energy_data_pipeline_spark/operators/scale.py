"""Scale techniques: bucketed co-located joins and skew salting.

These are the two levers SURVEY §4 lists as the engine's answer to
the reference's manual physical tricks (staging tables, thread pools)
when the data is 1000× bigger than any single node:

- **Bucketing** pre-shuffles a table ONCE at write time; every
  subsequent equi-join/aggregation on the bucket key skips its
  exchange entirely. The write is Spark's `bucketBy` (hash of the
  key mod n buckets, hive-compatible layout).
- **Salting** splits a hot join key into `salt` sub-keys: the skewed
  side gets a random salt, the small side is exploded `salt`× so
  every sub-key still matches. Turns one straggler task into `salt`
  even tasks. (AQE's skew-join split handles *sort-merge* skew
  automatically; salting is the explicit form that also works for
  aggregations and pre-AQE plans.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) table.

    Joins and groupBys on ``bucket_cols`` between tables bucketed the
    same way run exchange-free (verified by plan assertion in
    tests/test_scale.py). Sorting within buckets additionally enables
    sort-merge joins without a per-query sort.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side
    with ``pmod(hash(monotonically_increasing_id), salt)`` (cheap,
    uniform, no RNG nondeterminism across retries) and replicate the
    small side ``salt``×.

    Output columns = the natural join's (salt column dropped).
    ``small`` should be the dimension side — its row count multiplies
    by ``salt``.
    """
    sk = skewed.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt)),
    )
    sm = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return sk.join(sm, on + ["__salt"], how).drop("__salt")
