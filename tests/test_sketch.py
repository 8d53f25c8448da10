"""Count-min sketch properties (operators/sketch.py): the estimate
never underestimates, collisions only inflate, grids merge by plain
addition, and the Spark grid matches the DuckDB twin cell-for-cell."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import sketch


@pytest.fixture(scope="module")
def stream(spark):
    # skewed stream: tok_i appears i+1 times, 40 distinct tokens
    rows = [(f"t{i:02d}",) for i in range(40) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "tok string")


class TestCountMin:
    def test_never_underestimates_even_under_collisions(self, spark, stream):
        # w=8 forces heavy collisions; the CMS bound must still hold
        grid = sketch.countmin_build(stream, d=3, w=8)
        assert grid.count() <= 3 * 8
        exact = stream.groupBy("tok").agg(F.count("*").alias("exact_c"))
        est = sketch.countmin_estimate(grid, exact, d=3, w=8)
        bad = est.filter(F.col("cms_est") < F.col("exact_c")).count()
        assert bad == 0
        # and with collisions there must be SOME inflation (40 tokens
        # into 8 buckets cannot be collision-free)
        inflated = est.filter(F.col("cms_est") > F.col("exact_c")).count()
        assert inflated > 0

    def test_grids_merge_by_addition(self, spark, stream):
        """CMS(a ∪ b) == cellwise CMS(a) + CMS(b) — the property that
        makes the sketch a streaming/partition-parallel structure."""
        a = stream.filter(F.col("tok") < "t20")
        b = stream.filter(F.col("tok") >= "t20")
        ga = sketch.countmin_build(a, d=2, w=16)
        gb = sketch.countmin_build(b, d=2, w=16)
        merged = (
            ga.select("row_id", "bucket", F.col("c").alias("ca"))
            .join(
                gb.select("row_id", "bucket", F.col("c").alias("cb")),
                ["row_id", "bucket"],
                "full",
            )
            .select(
                "row_id",
                "bucket",
                (
                    F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))
                ).alias("c"),
            )
        )
        want = {
            (r.row_id, r.bucket): r.c
            for r in sketch.countmin_build(stream, d=2, w=16).collect()
        }
        got = {(r.row_id, r.bucket): r.c for r in merged.collect()}
        assert got == want

    def test_grid_matches_duckdb_twin(self, spark, stream):
        grid = {
            (r.row_id, r.bucket): r.c
            for r in sketch.countmin_build(stream, d=2, w=32).collect()
        }
        pdf = stream.toPandas()
        con = duckdb.connect()
        con.register("toks", pdf)
        want = {
            (int(r0), int(b)): int(c)
            for r0, b, c in con.execute(
                f"""
                SELECT CAST(r AS INT) AS row_id,
                       {sketch.duck_bucket_sql('tok', 'r', 32)} AS bucket,
                       COUNT(*) AS c
                FROM toks, unnest(range(0, 2)) t(r)
                GROUP BY 1, 2
                """
            ).fetchall()
        }
        con.close()
        assert grid == want


class TestUnseenTokens:
    def test_never_seen_token_estimates_zero(self, spark, stream):
        """A probe the stream never contained has empty cells —
        counters of ZERO, not min-over-whatever-collided (the
        inner-join form overestimated unseen tokens or dropped
        them when all d cells were empty)."""
        grid = sketch.countmin_build(stream, d=3, w=1024)
        probes = spark.createDataFrame(
            [("t00", 1), ("never-seen-token", 0)], "tok string, exact_c int"
        )
        got = {
            r.tok: r.cms_est
            for r in sketch.countmin_estimate(
                grid, probes, d=3, w=1024
            ).collect()
        }
        assert got["never-seen-token"] == 0
        assert got["t00"] >= 1


class TestHyperLogLog:
    def test_registers_merge_by_max(self, spark, stream):
        """HLL(a ∪ b) register state == cellwise max of HLL(a),
        HLL(b) — the property that makes per-day grids fold into
        rolling distinct counts without rescanning history."""
        a = stream.filter(F.col("tok") < "t20")
        b = stream.filter(F.col("tok") >= "t20")
        ra = sketch.hll_registers(a).withColumnRenamed("register", "ra")
        rb = sketch.hll_registers(b).withColumnRenamed("register", "rb")
        merged = (
            ra.join(rb, "bucket", "full")
            .select(
                "bucket",
                F.greatest(
                    F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))
                ).alias("register"),
            )
        )
        whole = sketch.hll_registers(stream)
        assert (
            merged.join(whole, "bucket", "full")
            .filter(
                whole.register.eqNullSafe(F.lit(None))
                | merged.register.eqNullSafe(F.lit(None))
                | (merged.register != whole.register)
            )
            .count()
            == 0
        )

    def test_estimate_tracks_exact_within_bound(self, spark):
        # 500 distinct values, m=64 -> sigma ~= 1.04/8 ~ 13%; allow 3 sigma
        vals = spark.createDataFrame(
            [(f"v{i}",) for i in range(500)], "tok string"
        )
        est = sketch.hll_estimate(sketch.hll_registers(vals)).first()
        assert abs(est.hll_est - 500) / 500 < 0.40

    def test_duplicates_do_not_move_registers(self, spark):
        once = spark.createDataFrame(
            [(f"v{i}",) for i in range(100)], "tok string"
        )
        thrice = once.union(once).union(once)
        r1 = sorted(
            (r.bucket, r.register)
            for r in sketch.hll_registers(once).collect()
        )
        r3 = sorted(
            (r.bucket, r.register)
            for r in sketch.hll_registers(thrice).collect()
        )
        assert r1 == r3
