"""CDC / MERGE queries (q105): latest-wins change-batch apply.

Completes the CDC story started by the T14 snapshot diff (q71,
``schema/ddl.py``): q71 *detects* what changed between two snapshots;
q105 *applies* a keyed change batch (upserts + delete tombstones) to a
base snapshot with ANSI ``MERGE INTO`` semantics
(``operators/cdc.merge_upsert``). The reference has neither — its
loader's only mutation primitive is the all-or-nothing idempotent
append gate (``src/data_loading/data_loader.py:377-468``).

The change batch is derived deterministically from the base table
(modular-arithmetic slices) so both engines construct byte-identical
inputs from the same parquet — no fixture files, no randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import dec_sum, dec_sum_sql
from ..operators import cdc
from ..sources.readers import load_table
from .registry import query


def _q105_oracle() -> str:
    base = """
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             0 AS version, false AS is_delete
      FROM orders
    """
    updates = """
      SELECT o_orderkey, 'R' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice,
             1 AS version, false AS is_delete
      FROM orders WHERE o_orderkey % 13 = 0
      UNION ALL
      SELECT -o_orderkey AS o_orderkey, o_orderstatus, o_totalprice,
             1 AS version, false AS is_delete
      FROM orders WHERE o_orderkey % 17 = 3
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             2 AS version, true AS is_delete
      FROM orders WHERE o_orderkey % 19 = 5
    """
    merged = cdc.merge_upsert_sql(
        base, updates, ["o_orderkey"], "version", "is_delete"
    )
    return f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {dec_sum_sql("o_totalprice")} AS sum_price,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
    FROM ({merged})
    GROUP BY o_orderstatus
    """


@query("q105_merge_upsert", headline=True, oracle=_q105_oracle())
def q105_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC apply): a deterministic change batch — price
    revisions (every 13th key, status→'R', price×1.1), inserts (every
    ``%17=3`` key mirrored to a negative key), and delete tombstones
    (every ``%19=5`` key at a later version) — folded into the orders
    snapshot by ``operators/cdc.merge_upsert`` (latest version per key
    wins, tombstones drop the key). The per-status aggregate
    checksums the merged snapshot: the key sum catches any
    wrongly-surviving/dropped row, the decimal price sum any
    wrongly-versioned one.

    Versions are constructed non-overlapping (revisions at v1,
    deletes at v2, inserts on disjoint keys) so ``(key, version)`` is
    unique — the operator's CDC contract.

    Scale: one hash shuffle of base ∪ changes on the merge key (what
    a SQL MERGE costs), per-key window fold, then the tiny aggregate;
    bucket both sides on the key (``operators/scale.write_bucketed``)
    and the exchange disappears.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.withColumns(
        {"version": F.lit(0), "is_delete": F.lit(False)}
    )
    revised = (
        orders.filter("o_orderkey % 13 = 0")
        .withColumns(
            {
                "o_orderstatus": F.lit("R"),
                "o_totalprice": F.col("o_totalprice") * 1.1,
                "version": F.lit(1),
                "is_delete": F.lit(False),
            }
        )
    )
    inserted = (
        orders.filter("o_orderkey % 17 = 3")
        .withColumns(
            {
                "o_orderkey": -F.col("o_orderkey"),
                "version": F.lit(1),
                "is_delete": F.lit(False),
            }
        )
    )
    deleted = (
        orders.filter("o_orderkey % 19 = 5")
        .withColumns({"version": F.lit(2), "is_delete": F.lit(True)})
    )
    updates = revised.unionByName(inserted).unionByName(deleted)
    merged = cdc.merge_upsert(
        base, updates, ["o_orderkey"], "version", "is_delete"
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("sum_price"),
        F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
    )
