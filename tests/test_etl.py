"""ETL layer tests — reference test strategy (SURVEY §5: tiny
fixtures, exact-output assertions) plus the J1/J2 overlap-gate truth
table from ``src/data_loading/data_loader.py:334-529``.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.etl import (
    apply_chunked,
    check_data_overlap,
    clean_identifier,
    coerce_int64,
    melt_wide,
    normalize_min_max,
    transform_sources,
    validate_unique,
    write_idempotent,
)
from building_energy_data_pipeline_spark.sources.readers import find_sources


@pytest.fixture()
def wide_df(spark):
    """The reference's melt fixture shape
    (``tests/test_data_transformer.py:26-31``): timestamp + one
    column per building."""
    return spark.createDataFrame(
        [
            ("2016-01-01 00:00:00", 1.0, 10.0),
            ("2016-01-01 01:00:00", 2.0, 20.0),
            ("2016-01-01 02:00:00", 3.0, 30.0),
        ],
        ["timestamp", "b1", "b2"],
    )


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def raw_existing(spark):
    rows = [
        (ts("2016-01-01 00:00:00"), "b1", "electricity", 1.0),
        (ts("2016-01-01 01:00:00"), "b1", "electricity", 2.0),
        (ts("2016-06-01 00:00:00"), "b2", "gas", 3.0),
    ]
    return spark.createDataFrame(
        rows, ["timestamp", "building_id", "meter", "meter_reading"]
    )


def raw_batch(spark, t0: str, building: str, meter: str):
    return spark.createDataFrame(
        [(ts(t0), building, meter, 9.9)],
        ["timestamp", "building_id", "meter", "meter_reading"],
    )


# ---------------------------------------------------------------------------
# Transforms (T1/T2/T5/F1, §2.12)
# ---------------------------------------------------------------------------


class TestMelt:
    def test_columns_and_row_count(self, wide_df):
        # reference asserts exact column set and n_buildings× rows
        # (tests/test_data_transformer.py:91-97)
        out = melt_wide(wide_df, "electricity")
        assert set(out.columns) == {
            "timestamp",
            "building_id",
            "meter_reading",
            "meter",
        }
        assert out.count() == wide_df.count() * 2

    def test_values(self, wide_df):
        out = melt_wide(wide_df, "gas")
        got = {
            (r["timestamp"], r["building_id"]): (r["meter_reading"], r["meter"])
            for r in out.collect()
        }
        assert got[("2016-01-01 00:00:00", "b1")] == (1.0, "gas")
        assert got[("2016-01-01 02:00:00", "b2")] == (30.0, "gas")


class TestNormalize:
    def test_global_bounds(self, wide_df):
        # reference asserts min==0 and max==1 (test_data_transformer.py:82-89)
        long = melt_wide(wide_df, "electricity")
        out = normalize_min_max(long)
        stats = out.agg(
            F.min("normalized_reading"), F.max("normalized_reading")
        ).first()
        assert stats[0] == 0.0 and stats[1] == 1.0
        # global bounds: b1's reading 1.0 is the global min → 0.0,
        # NOT 0.0-per-building (the reference's chunk-local bug)
        v = {
            (r["building_id"], r["meter_reading"]): r["normalized_reading"]
            for r in out.collect()
        }
        assert v[("b2", 20.0)] == pytest.approx((20.0 - 1.0) / 29.0)

    def test_partitioned_bounds(self, spark):
        df = spark.createDataFrame(
            [("electricity", 0.0), ("electricity", 10.0), ("gas", 5.0), ("gas", 15.0)],
            ["meter", "meter_reading"],
        )
        out = normalize_min_max(df, partition_by=["meter"])
        v = {
            (r["meter"], r["meter_reading"]): r["normalized_reading"]
            for r in out.collect()
        }
        assert v[("gas", 15.0)] == 1.0 and v[("electricity", 10.0)] == 1.0


class TestCoerce:
    def test_coerce_semantics(self, spark):
        # pandas to_numeric(errors="coerce") parity: invalid → null,
        # floats rounded HALF-EVEN (banker's, like numpy), ints kept
        df = spark.createDataFrame(
            [("1", "x"), ("2.6", "y"), ("oops", "z"), (None, "w"),
             ("0.5", "u"), ("1.5", "v2")],
            ["v", "k"],
        )
        out = coerce_int64(df, ["v", "not_present"])
        got = [r["v"] for r in out.orderBy("k").collect()]  # k: u,v2,w,x,y,z
        assert got == [0, 2, None, 1, 3, None]
        assert dict(out.dtypes)["v"] == "bigint"


class TestCleanIdentifier:
    @pytest.mark.parametrize(
        "raw,expect",
        [
            ("My Column!", "my_column_"),
            ("2nd_reading", "col_2nd_reading"),
            ("ok_name", "ok_name"),
        ],
    )
    def test_cases(self, raw, expect):
        # schema_analyzer.py:68-72 semantics
        assert clean_identifier(raw) == expect

    def test_table_prefix(self):
        assert clean_identifier("2020data", is_table=True) == "tbl_2020data"


class TestChunkedPipeline:
    def test_reference_callable_contract(self, wide_df):
        # a reference-style process_function(chunk, meter_type) runs
        # unchanged through mapInPandas; row count conserved
        def add_flag(chunk: pd.DataFrame, meter_type: str) -> pd.DataFrame:
            chunk = chunk.copy()
            chunk["meter"] = meter_type
            return chunk

        out = apply_chunked(
            wide_df,
            add_flag,
            "steam",
            "timestamp string, b1 double, b2 double, meter string",
        )
        assert out.count() == wide_df.count()
        assert out.select("meter").distinct().collect()[0][0] == "steam"


class TestTransformSources:
    def test_csv_corpus_to_parquet(self, spark, tmp_path):
        # §3.2 end-to-end: meter folders melt (meter = file stem),
        # metadata passes through (data_transformer.py:376-382)
        raw = tmp_path / "src" / "raw"
        meta = tmp_path / "src" / "metadata"
        raw.mkdir(parents=True)
        meta.mkdir(parents=True)
        (raw / "electricity.csv").write_text(
            "timestamp,b1,b2\n2016-01-01 00:00:00,1.0,2.0\n"
            "2016-01-01 01:00:00,3.0,4.0\n"
        )
        (raw / "gas.csv").write_text(
            "timestamp,b1,b2\n2016-01-01 00:00:00,5.0,6.0\n"
        )
        (meta / "metadata.csv").write_text("building_id,sqft\nb1,100\nb2,200\n")

        folders = find_sources(str(tmp_path / "src"), "csv")
        out = transform_sources(spark, folders, str(tmp_path / "out"))
        assert set(out) == {"raw", "metadata"}

        raw_out = spark.read.parquet(out["raw"])
        assert set(raw_out.columns) == {
            "timestamp",
            "building_id",
            "meter_reading",
            "meter",
        }
        assert raw_out.count() == 2 * 2 + 1 * 2  # rows × buildings per file
        meters = {r[0] for r in raw_out.select("meter").distinct().collect()}
        assert meters == {"electricity", "gas"}

        meta_out = spark.read.parquet(out["metadata"])
        assert set(meta_out.columns) == {"building_id", "sqft"}
        assert meta_out.count() == 2


# ---------------------------------------------------------------------------
# Overlap gate truth table (J1/J2)
# ---------------------------------------------------------------------------


class TestOverlapGateRaw:
    def test_no_existing_table(self, spark):
        batch = raw_batch(spark, "2016-01-01 00:30:00", "b1", "electricity")
        assert check_data_overlap(None, batch, "raw").has_overlap is False

    def test_same_entity_meter_time(self, spark, raw_existing):
        batch = raw_batch(spark, "2016-01-01 00:30:00", "b1", "electricity")
        res = check_data_overlap(raw_existing, batch, "raw")
        assert res.has_overlap is True
        assert res.affected_entities == ["b1"]
        assert "b1" in res.overlap_details

    def test_tolerance_boundary_inclusive(self, spark, raw_existing):
        # existing 01:00; batch at 02:00 → window [01:00, 03:00]
        # BETWEEN inclusive ⇒ overlap (data_loader.py:389)
        batch = raw_batch(spark, "2016-01-01 02:00:00", "b1", "electricity")
        assert check_data_overlap(raw_existing, batch, "raw").has_overlap is True

    def test_outside_tolerance(self, spark, raw_existing):
        batch = raw_batch(spark, "2016-01-01 02:00:01", "b1", "electricity")
        assert check_data_overlap(raw_existing, batch, "raw").has_overlap is False

    def test_same_time_different_meter(self, spark, raw_existing):
        # meter conjunct: same building+time but meter not in batch → no overlap
        batch = raw_batch(spark, "2016-01-01 00:30:00", "b1", "water")
        assert check_data_overlap(raw_existing, batch, "raw").has_overlap is False

    def test_same_time_different_building(self, spark, raw_existing):
        batch = raw_batch(spark, "2016-01-01 00:30:00", "b9", "electricity")
        assert check_data_overlap(raw_existing, batch, "raw").has_overlap is False

    def test_missing_column_raises(self, spark):
        bad = spark.createDataFrame([(1.0,)], ["meter_reading"])
        with pytest.raises(ValueError, match="Missing required column"):
            check_data_overlap(None, bad, "raw")

    def test_unsupported_table_raises(self, spark):
        df = spark.createDataFrame([(1.0,)], ["x"])
        with pytest.raises(ValueError, match="Unsupported table"):
            check_data_overlap(None, df, "sessions")


class TestOverlapGateWeather:
    def test_site_no_meter_conjunct(self, spark):
        existing = spark.createDataFrame(
            [(ts("2016-01-01 00:00:00"), "s1", 20.0)],
            ["timestamp", "site_id", "airTemperature"],
        )
        batch = spark.createDataFrame(
            [(ts("2016-01-01 00:30:00"), "s1", 21.0)],
            ["timestamp", "site_id", "airTemperature"],
        )
        res = check_data_overlap(existing, batch, "weather")
        assert res.has_overlap is True and res.affected_entities == ["s1"]
        assert "site(s)" in res.overlap_details


class TestOverlapGateMetadata:
    def test_key_only_no_time(self, spark):
        existing = spark.createDataFrame([("b1", 100)], ["building_id", "sqft"])
        hit = spark.createDataFrame([("b1", 200)], ["building_id", "sqft"])
        miss = spark.createDataFrame([("b2", 200)], ["building_id", "sqft"])
        res = check_data_overlap(existing, hit, "metadata")
        assert res.has_overlap is True and res.overlap_range is None
        assert res.affected_entities == ["b1"]
        assert check_data_overlap(existing, miss, "metadata").has_overlap is False


# ---------------------------------------------------------------------------
# Idempotent writer (C4/C5)
# ---------------------------------------------------------------------------


class TestWriteIdempotent:
    KEYS = ["timestamp", "building_id", "meter"]

    def test_first_load_dedups_and_writes(self, spark, tmp_path):
        p = str(tmp_path / "raw")
        batch = raw_batch(spark, "2016-01-01 00:00:00", "b1", "electricity")
        dup = batch.unionByName(batch)  # violates the unique key
        res = write_idempotent(
            dup, p, "raw", self.KEYS, existing=None, partition_by=["meter"]
        )
        assert res.has_overlap is False
        stored = spark.read.parquet(p)
        assert stored.count() == 1  # dropDuplicates enforced C5
        assert validate_unique(stored, self.KEYS).count() == 0

    def test_overlapping_reload_writes_nothing(self, spark, tmp_path):
        p = str(tmp_path / "raw")
        batch = raw_batch(spark, "2016-01-01 00:00:00", "b1", "electricity")
        write_idempotent(batch, p, "raw", self.KEYS, existing=None)
        existing = spark.read.parquet(p)
        res = write_idempotent(batch, p, "raw", self.KEYS, existing=existing)
        assert res.has_overlap is True
        assert spark.read.parquet(p).count() == 1  # unchanged

    def test_disjoint_append(self, spark, tmp_path):
        p = str(tmp_path / "raw")
        b1 = raw_batch(spark, "2016-01-01 00:00:00", "b1", "electricity")
        write_idempotent(b1, p, "raw", self.KEYS, existing=None)
        b2 = raw_batch(spark, "2017-01-01 00:00:00", "b1", "electricity")
        res = write_idempotent(
            b2, p, "raw", self.KEYS, existing=spark.read.parquet(p)
        )
        assert res.has_overlap is False
        assert spark.read.parquet(p).count() == 2
