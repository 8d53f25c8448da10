"""Range-join operator: exact equivalence to the naive non-equi join,
half-open bounds, left-join semantics, plan shape (equi-join on the
bin key, not BroadcastNestedLoopJoin), and the q51 HLL error bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators.rangejoin import (
    point_in_interval_join,
)
from building_energy_data_pipeline_spark.ops import explain_str


@pytest.fixture()
def points(spark):
    return spark.range(0, 500).select((F.col("id") * 3.7).alias("x"),
                                      F.col("id").alias("pid"))


@pytest.fixture()
def intervals(spark):
    rows = [("a", 10.0, 55.0), ("b", 50.0, 51.0), ("c", 300.0, 1200.0),
            ("d", -40.0, 12.5), ("e", 2000.0, 2010.0)]
    return spark.createDataFrame(rows, ["tag", "lo", "hi"])


def naive(points, intervals):
    return points.crossJoin(intervals).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    )


class TestPointInIntervalJoin:
    @pytest.mark.parametrize("bin_width", [1.0, 25.0, 1000.0])
    def test_matches_naive_join(self, spark, points, intervals, bin_width):
        got = point_in_interval_join(
            points, "x", intervals, "lo", "hi", bin_width
        )
        want = naive(points, intervals)
        key = lambda r: (r["pid"], r["tag"])  # noqa: E731
        assert sorted(map(tuple, got.select("pid", "tag", "x").collect())) == sorted(
            map(tuple, want.select("pid", "tag", "x").collect())
        )

    def test_half_open_bounds(self, spark):
        pts = spark.createDataFrame([(10.0,), (20.0,)], ["x"])
        iv = spark.createDataFrame([("t", 10.0, 20.0)], ["tag", "lo", "hi"])
        out = point_in_interval_join(pts, "x", iv, "lo", "hi", 5.0).collect()
        assert [r["x"] for r in out] == [10.0]  # lo inclusive, hi exclusive

    def test_no_duplicate_pairs_across_bins(self, spark, points, intervals):
        # interval "c" spans 9 bins at width 100 — each matching point
        # must still pair with it exactly once
        out = point_in_interval_join(
            points, "x", intervals, "lo", "hi", 100.0
        )
        dups = (
            out.groupBy("pid", "tag").count().filter(F.col("count") > 1).count()
        )
        assert dups == 0

    def test_left_join_keeps_unmatched_points(self, spark, points, intervals):
        out = point_in_interval_join(
            points, "x", intervals, "lo", "hi", 50.0, how="left"
        )
        assert out.count() >= points.count()
        unmatched = out.filter(F.col("tag").isNull()).count()
        # points in (55, 300) and (1200, 1848.5] match nothing
        assert unmatched > 0

    def test_plan_is_equi_join(self, spark, points, intervals):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = explain_str(
                point_in_interval_join(points, "x", intervals, "lo", "hi", 50.0)
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_rejects_bad_args(self, spark, points, intervals):
        with pytest.raises(ValueError):
            point_in_interval_join(points, "x", intervals, "lo", "hi", 0)
        with pytest.raises(ValueError):
            point_in_interval_join(points, "x", intervals, "lo", "hi", 1.0,
                                   how="outer")


def test_q51_hll_error_within_bound(spark, sf_dir):
    from building_energy_data_pipeline_spark.plans.olap_queries import (
        q51_approx_distinct,
    )

    rows = q51_approx_distinct(spark, sf_dir).collect()
    assert rows, "expected at least one event_type group"
    for r in rows:
        assert r["within_bound"] is True  # HLL++ within 5× the 2% rsd
