"""Incremental rollup maintenance (`operators/ivm.py`).

The oracle-parity row for q233 proves maintained state == full
recompute on the warehouse data; these tests pin the operator's
per-path behavior on a crafted truth table (where every maintenance
path is forced deterministically) and assert the q233 construction
exercises every path non-vacuously.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import ivm
from building_energy_data_pipeline_spark.plans.queries import REGISTRY

from conftest import SF_DIR

KEYS = ["g"]
SUMS = ["v"]
MMS = ["v"]


def _detail(spark, rows):
    return spark.createDataFrame(rows, "g string, id bigint, v bigint")


class TestCraftedTruthTable:
    def test_every_path(self, spark):
        # A: delete ties the min -> dirty recompute
        # B: delete strictly inside the extremes -> algebraic
        # C: all rows deleted -> group dropped
        # D: unseen key, insert-only -> new group
        # E: untouched
        before = _detail(
            spark,
            [
                ("A", 1, 10), ("A", 2, 20), ("A", 3, 30),
                ("B", 4, 10), ("B", 5, 20), ("B", 6, 30),
                ("C", 7, 5),
                ("E", 8, 7),
            ],
        )
        cdc = (
            _detail(
                spark,
                [
                    ("A", 1, 10),   # D: removes the min witness
                    ("B", 5, 20),   # D: interior value
                    ("C", 7, 5),    # D: empties the group
                ],
            ).withColumn(ivm.OP_COL, F.lit("D"))
        ).unionByName(
            _detail(
                spark,
                [("B", 9, 40), ("D", 10, 1), ("D", 11, 2)],
            ).withColumn(ivm.OP_COL, F.lit("I"))
        )
        after = _detail(
            spark,
            [
                ("A", 2, 20), ("A", 3, 30),
                ("B", 4, 10), ("B", 6, 30), ("B", 9, 40),
                ("D", 10, 1), ("D", 11, 2),
                ("E", 8, 7),
            ],
        )
        state0 = ivm.rollup_state(before, KEYS, SUMS, MMS)
        got = (
            ivm.maintain_rollup(state0, cdc, after, KEYS, SUMS, MMS)
            .toPandas()
            .set_index("g")
            .sort_index()
        )
        want = (
            ivm.rollup_state(after, KEYS, SUMS, MMS)
            .toPandas()
            .set_index("g")
            .sort_index()
        )
        assert list(got.index) == ["A", "B", "D", "E"]  # C dropped
        for col in ("cnt", "sum_v", "min_v", "max_v"):
            assert (got[col] == want[col]).all(), col
        # the dirty group really did need the recompute: its new min
        # is NOT derivable from the old state + batch algebra
        assert int(got.loc["A", "min_v"]) == 20

        census = dict(
            ivm.maintenance_census(state0, cdc, KEYS, MMS)
            .toPandas()
            .set_index("g")["path"]
        )
        assert census == {
            "A": "dirty",
            "B": "algebraic",
            "C": "dropped",
            "D": "new",
            "E": "untouched",
        }

    def test_new_key_with_intra_batch_delete_is_dirty(self, spark):
        # ADVICE r7 (medium): an UNSEEN key whose batch carries both
        # inserts and deletes (the 'update = delete + insert'
        # convention) must recompute — the algebraic branch would
        # take max from the insert extremes alone. Repro from the
        # advice: state {} + I(10), I(5), D(10) → true max is 5.
        before = _detail(spark, [("Z", 0, 1)])  # unrelated key only
        cdc = (
            _detail(spark, [("N", 1, 10), ("N", 2, 5)]).withColumn(
                ivm.OP_COL, F.lit("I")
            )
        ).unionByName(
            _detail(spark, [("N", 1, 10)]).withColumn(
                ivm.OP_COL, F.lit("D")
            )
        )
        after = _detail(spark, [("Z", 0, 1), ("N", 2, 5)])
        state0 = ivm.rollup_state(before, KEYS, SUMS, MMS)
        got = (
            ivm.maintain_rollup(state0, cdc, after, KEYS, SUMS, MMS)
            .toPandas()
            .set_index("g")
        )
        assert int(got.loc["N", "cnt"]) == 1
        assert int(got.loc["N", "sum_v"]) == 5
        assert int(got.loc["N", "min_v"]) == 5
        assert int(got.loc["N", "max_v"]) == 5  # not 10
        census = dict(
            ivm.maintenance_census(state0, cdc, KEYS, MMS)
            .toPandas()
            .set_index("g")["path"]
        )
        assert census["N"] == "dirty"  # not 'new'

    def test_new_key_net_deleted_is_dropped(self, spark):
        # unseen key whose inserts and deletes cancel: the dirty
        # route must not resurrect it (new_cnt = 0 filter), and the
        # census reports it 'dropped' — not 'dirty' — so the
        # recompute cost estimate stays faithful (r8 review #4)
        before = _detail(spark, [("Z", 0, 1)])
        cdc = (
            _detail(spark, [("N", 1, 10)]).withColumn(
                ivm.OP_COL, F.lit("I")
            )
        ).unionByName(
            _detail(spark, [("N", 1, 10)]).withColumn(
                ivm.OP_COL, F.lit("D")
            )
        )
        after = _detail(spark, [("Z", 0, 1)])
        state0 = ivm.rollup_state(before, KEYS, SUMS, MMS)
        got = ivm.maintain_rollup(
            state0, cdc, after, KEYS, SUMS, MMS
        ).toPandas()
        assert list(got["g"]) == ["Z"]
        census = dict(
            ivm.maintenance_census(state0, cdc, KEYS, MMS)
            .toPandas()
            .set_index("g")["path"]
        )
        assert census["N"] == "dropped"

    def test_seen_key_with_null_extremes_routes_dirty(self, spark):
        # r8 review #1 (live repro): a SEEN key whose stored min/max
        # are NULL (all base values NULL) with an intra-batch I+D
        # pair of the same value must recompute — the clean branch
        # would fabricate min=max=10 from the insert extreme where
        # the truth is NULL/NULL
        rows = [("A", 1, None), ("A", 2, None)]
        before = spark.createDataFrame(
            rows, "g string, id bigint, v bigint"
        )
        cdc = (
            _detail(spark, [("A", 3, 10)]).withColumn(
                ivm.OP_COL, F.lit("I")
            )
        ).unionByName(
            _detail(spark, [("A", 3, 10)]).withColumn(
                ivm.OP_COL, F.lit("D")
            )
        )
        after = before
        state0 = ivm.rollup_state(before, KEYS, SUMS, MMS)
        got = (
            ivm.maintain_rollup(state0, cdc, after, KEYS, SUMS, MMS)
            .toPandas()
            .set_index("g")
        )
        want = (
            ivm.rollup_state(after, KEYS, SUMS, MMS)
            .toPandas()
            .set_index("g")
        )
        assert int(got.loc["A", "cnt"]) == int(want.loc["A", "cnt"])
        assert got.loc["A", "min_v"] is None or (
            got.loc["A", "min_v"] != got.loc["A", "min_v"]
        )  # NULL (pandas NaN), never a fabricated 10
        assert got.loc["A", "max_v"] is None or (
            got.loc["A", "max_v"] != got.loc["A", "max_v"]
        )
        census = dict(
            ivm.maintenance_census(state0, cdc, KEYS, MMS)
            .toPandas()
            .set_index("g")["path"]
        )
        assert census["A"] == "dirty"

    def test_null_valued_deletes_stay_algebraic(self, spark):
        # a D row whose min/max value is NULL can never have been an
        # extreme witness — it must NOT trigger a recompute, and the
        # algebraic patch must still be exact
        before = spark.createDataFrame(
            [("A", 1, 10), ("A", 2, 20), ("A", 3, None)],
            "g string, id bigint, v bigint",
        )
        cdc = spark.createDataFrame(
            [("A", 3, None)], "g string, id bigint, v bigint"
        ).withColumn(ivm.OP_COL, F.lit("D"))
        after = _detail(spark, [("A", 1, 10), ("A", 2, 20)])
        state0 = ivm.rollup_state(before, KEYS, SUMS, MMS)
        census = dict(
            ivm.maintenance_census(state0, cdc, KEYS, MMS)
            .toPandas()
            .set_index("g")["path"]
        )
        assert census["A"] == "algebraic"
        got = (
            ivm.maintain_rollup(state0, cdc, after, KEYS, SUMS, MMS)
            .toPandas()
            .set_index("g")
        )
        assert int(got.loc["A", "cnt"]) == 2
        assert int(got.loc["A", "min_v"]) == 10
        assert int(got.loc["A", "max_v"]) == 20

    def test_insert_extends_extremes_algebraically(self, spark):
        before = _detail(spark, [("A", 1, 10), ("A", 2, 20)])
        cdc = _detail(spark, [("A", 3, 5), ("A", 4, 99)]).withColumn(
            ivm.OP_COL, F.lit("I")
        )
        after = _detail(
            spark,
            [("A", 1, 10), ("A", 2, 20), ("A", 3, 5), ("A", 4, 99)],
        )
        state0 = ivm.rollup_state(before, KEYS, SUMS, MMS)
        census = dict(
            ivm.maintenance_census(state0, cdc, KEYS, MMS)
            .toPandas()
            .set_index("g")["path"]
        )
        assert census == {"A": "algebraic"}  # inserts never dirty
        got = ivm.maintain_rollup(
            state0, cdc, after, KEYS, SUMS, MMS
        ).toPandas()
        assert int(got["min_v"].iloc[0]) == 5
        assert int(got["max_v"].iloc[0]) == 99


class TestQ233Census:
    def test_all_paths_populated_on_warehouse_data(self, spark):
        # rebuild the q233 construction and assert its path census
        # leaves no path vacuous (the docstring's claim)
        from building_energy_data_pipeline_spark.sources.readers import (
            load_table,
        )

        l = load_table(spark, SF_DIR, "lineitem").select(
            "l_returnflag",
            F.expr(
                "cast(year(l_shipdate) * 100 + month(l_shipdate)"
                " as bigint)"
            ).alias("ym"),
            F.expr("cast(l_quantity as bigint)").alias("qty"),
            F.expr(
                "cast(floor(l_extendedprice * 100"
                " + cast(0.5 as double)) as bigint)"
            ).alias("price_c"),
            "l_orderkey",
            "l_shipdate",
        )
        keys = ["l_returnflag", "ym"]
        base = l.where("l_shipdate < timestamp'1998-01-01'")
        cdc = (
            l.where("l_shipdate >= timestamp'1998-01-01'")
            .withColumn(ivm.OP_COL, F.lit("I"))
            .unionByName(
                base.where("l_orderkey % 7 = 0").withColumn(
                    ivm.OP_COL, F.lit("D")
                )
            )
        )
        state0 = ivm.rollup_state(
            base, keys, ["qty", "price_c"], ["price_c"]
        )
        census = (
            ivm.maintenance_census(state0, cdc, keys, ["price_c"])
            .groupBy("path")
            .count()
            .toPandas()
            .set_index("path")["count"]
        )
        for path in ("new", "dirty", "algebraic", "untouched"):
            assert census.get(path, 0) > 0, (path, dict(census))

    def test_q233_registered_and_nonempty(self, spark):
        out = (
            REGISTRY["q233_incremental_rollup"]
            .spark(spark, SF_DIR)
            .toPandas()
        )
        assert len(out) > 100
        assert (out["cnt"] > 0).all()
