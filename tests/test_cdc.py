"""Unit tests for the CDC MERGE operator (operators/cdc.py) — the
latest-wins/tombstone truth table on hand-built frames. End-to-end
parity (including the DuckDB QUALIFY twin) is covered by
q105_merge_upsert in test_oracle_parity.py.
"""

from __future__ import annotations

from building_energy_data_pipeline_spark.operators.cdc import merge_upsert


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestMergeUpsert:
    def test_latest_wins_and_insert_and_carryover(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 0), (2, "b", 0)], "k int, v string, version int"
        )
        upd = spark.createDataFrame(
            [(1, "a2", 1), (3, "c", 1)], "k int, v string, version int"
        )
        got = merge_upsert(base, upd, ["k"], "version")
        assert _rows(got) == [(1, "a2", 1), (2, "b", 0), (3, "c", 1)]

    def test_tombstone_drops_key_not_just_version(self, spark):
        # the delete must remove the KEY — not merely lose to, or
        # resurrect, the older live version underneath it
        base = spark.createDataFrame(
            [(1, "a", 0, False), (2, "b", 0, False)],
            "k int, v string, version int, is_delete boolean",
        )
        upd = spark.createDataFrame(
            [(1, "a", 1, True)],
            "k int, v string, version int, is_delete boolean",
        )
        got = merge_upsert(base, upd, ["k"], "version", "is_delete")
        assert _rows(got) == [(2, "b", 0, False)]

    def test_out_of_order_delivery(self, spark):
        # CDC batches arrive unordered: an old change in the batch
        # must not overwrite a newer base row
        base = spark.createDataFrame(
            [(1, "new", 5)], "k int, v string, version int"
        )
        upd = spark.createDataFrame(
            [(1, "stale", 3)], "k int, v string, version int"
        )
        got = merge_upsert(base, upd, ["k"], "version")
        assert _rows(got) == [(1, "new", 5)]

    def test_null_delete_flag_is_live(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 0, None)],
            "k int, v string, version int, is_delete boolean",
        )
        upd = spark.createDataFrame(
            [], "k int, v string, version int, is_delete boolean"
        )
        got = merge_upsert(base, upd, ["k"], "version", "is_delete")
        assert _rows(got) == [(1, "a", 0, None)]

    def test_composite_key(self, spark):
        base = spark.createDataFrame(
            [(1, "x", "a", 0), (1, "y", "b", 0)],
            "k1 int, k2 string, v string, version int",
        )
        upd = spark.createDataFrame(
            [(1, "x", "a2", 1)], "k1 int, k2 string, v string, version int"
        )
        got = merge_upsert(base, upd, ["k1", "k2"], "version")
        assert _rows(got) == [(1, "x", "a2", 1), (1, "y", "b", 0)]
