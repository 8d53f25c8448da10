"""Local mirror of the driver's t2 correctness gate: run every
registry query on Spark AND its DuckDB oracle at sf0.001, compare
row count, column names, and exact canonicalized values.

Stricter than approximate float comparison on purpose — the decimal
aggregation convention (functions/scalar.py) is supposed to make
results bit-identical; any drift shows up here before the driver
sees it.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from building_energy_data_pipeline_spark.plans.queries import REGISTRY
from building_energy_data_pipeline_spark.sources.readers import TPCH_TABLES

from conftest import SF_DIR


def _norm(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return None
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False):
        out.append(tuple(_norm(v) for v in row))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


ORACLE_CASES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_CASES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    got = spec.spark(spark, SF_DIR).toPandas()
    con = duck_con(SF_DIR)
    want = con.execute(spec.oracle).fetchdf()
    con.close()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    cg, cw = canon(got), canon(want)
    mismatches = [(a, b) for a, b in zip(cg, cw) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
