"""Oracle-checked query library — the engine's relational surface.

Every capability row from SURVEY.md §2 that is SQL-expressible lives
here as a named :class:`QuerySpec`: a Spark DataFrame program plus the
ANSI-SQL oracle DuckDB runs on the same parquet tables. The driver
hash-compares the two at sf0.01 (see ``__spark_entry__.py``).

Reproducibility rules (see ``functions/scalar.py`` for the why):

- float aggregates go through DECIMAL (``dec_sum``/``dec_avg`` and
  their generated SQL twins) so results are order-independent and
  engine-identical;
- every LIMIT query sorts on a unique tiebreaker;
- set-valued aggregates are sorted (``sort_array``/``list_sort``)
  before stringification;
- timestamps compare under session TZ = UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.scalar import dec_avg, dec_avg_sql, dec_sum, dec_sum_sql
from ..sources.readers import load_table


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


# ---------------------------------------------------------------------------
# Aggregation surface (SURVEY §2.4 A1/A5, §2.8 F3/F4)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_sql("l_quantity")} AS sum_qty,
           {dec_sum_sql("l_extendedprice")} AS sum_base_price,
           {dec_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {dec_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", scale=8)}
               AS sum_charge,
           {dec_avg_sql("l_quantity")} AS avg_qty,
           {dec_avg_sql("l_extendedprice")} AS avg_price,
           {dec_avg_sql("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped grouped multi-aggregate (A1/A5/F3).

    Scale: one scan, map-side partial agg on 6 groups — shuffle moves
    only 6×|aggs| rows regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(disc_price * (1 + F.col("l_tax")), scale=8).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filters / predicates (SURVEY §2.2 P3/P4/P5)
# ---------------------------------------------------------------------------


@query(
    "q02_filtered_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
      AND l_discount > 0.02
    """,
    headline=True,
)
def q02_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list (P4) + time-range (P5) + threshold (P3) conjunctive
    filter with projection — all pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").between(
            F.to_timestamp(F.lit("1995-01-01 00:00:00")),
            F.to_timestamp(F.lit("1996-12-31 00:00:00")),
        )
        & (F.col("l_discount") > 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@query(
    "q03_top_revenue_orders",
    oracle=f"""
    SELECT o.o_orderkey, c.c_name, o.o_orderdate, rev.revenue
    FROM orders o
    JOIN (SELECT l_orderkey,
                 {dec_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
          FROM lineitem GROUP BY l_orderkey) rev
      ON o.o_orderkey = rev.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY rev.revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi join (J3) + grouped agg + deterministic top-k (O1/O3).

    Scale: lineitem agg shuffles on l_orderkey; customer is a
    dimension → broadcast (no shuffle of the fact side for that join);
    top-k is a TakeOrdered, never a full sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = li.groupBy("l_orderkey").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", "o_orderdate", "revenue")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q04_exists_semi_join",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00')
    """,
)
def q04_exists_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (J1/J2 family: the idempotent-load
    overlap gate shape, ``data_loader.py:377-429``)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    recent = li.filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-06-01 00:00:00"))
    )
    return orders.join(
        recent, orders.o_orderkey == recent.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "q05_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    """,
)
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN / NOT EXISTS → left-anti join (J7,
    ``postgres_manager.py:1064-1075``): customers with no 1998+ order.
    (Unfiltered anti-join is degenerate — every customer has *some*
    order at sf≥0.01.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q06_nation_customer_rollup",
    oracle=f"""
    SELECT n.n_name,
           COUNT(c.c_custkey) AS n_customers,
           {dec_sum_sql("c.c_acctbal")} AS total_acctbal,
           array_to_string(
               list_sort(list(DISTINCT c.c_mktsegment)
                         FILTER (WHERE c.c_mktsegment IS NOT NULL)),
               ', ') AS segments
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q06_nation_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + grouped agg + distinct string aggregation
    (J4/A3/A6: ``array_agg(DISTINCT ...)`` / ``string_agg`` →
    ``sort_array(collect_set)`` + ``array_join``)."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dec_sum("c_acctbal").alias("total_acctbal"),
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ", ").alias(
                "segments"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5 — the engine's upgrade over chunk-local pandas)
# ---------------------------------------------------------------------------


@query(
    "q07_event_gaps",
    oracle="""
    SELECT event_id, user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
               (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
    FROM events
    """,
)
def q07_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window over per-user event time — the A9 monotonicity
    primitive (reference computes chunk-local in pandas; we compute a
    true partitioned window)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Reshaping (SURVEY §2.9 T1 — melt/unpivot)
# ---------------------------------------------------------------------------


@query(
    "q08_unpivot_metrics",
    oracle=f"""
    WITH lu AS (
        SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    SELECT metric, COUNT(*) AS n_vals,
           {dec_sum_sql("val")} AS sum_val,
           MIN(val) AS min_val, MAX(val) AS max_val
    FROM lu GROUP BY metric
    """,
    headline=True,
)
def q08_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (T1, the reference's melt
    ``data_transformer.py:169-211``) + per-metric profile."""
    li = load_table(spark, sf_dir, "lineitem")
    lu = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return lu.groupBy("metric").agg(
        F.count("*").alias("n_vals"),
        dec_sum("val").alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
