"""Driver-contract regression: every query must run under a PLAIN
SparkSession, not just the engine's ``session.get_spark()`` factory.

Round-1 failure mode: the correctness harness builds its own session
with default confs, so every ``events.parquet`` read died with
``PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS,false))`` — the
nanos-timestamp workaround lived only in the session factory. The fix
is ``sources.readers.ensure_session_confs`` applied inside
``load_table`` (and in the readStream query paths); these tests pin it.

The "plain" fixture clones the shared session (``newSession`` has an
independent SQLConf) and unsets the engine confs; the first test
proves the simulation is faithful by reproducing the original crash.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as driver_entry

ENGINE_CONFS = (
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
)

# events-touching queries across the read paths: load_table batch reads
# (q07/q16/q25/q41) and the readStream path (q52).
EVENTS_BATCH_QUERIES = (
    "q07_event_gaps",
    "q16_monthly_orders",
    "q25_hourly_rollup",
    "q41_moving_average",
)


@pytest.fixture()
def plain(spark):
    """A session with the engine confs stripped — the driver's view."""
    s = spark.newSession()
    for key in ENGINE_CONFS:
        try:
            s.conf.unset(key)
        except Exception:
            pass
    return s


def test_plain_session_reproduces_round1_crash(plain, sf_dir):
    """Guard that the fixture is faithful: without nanosAsLong a direct
    events read really does fail, exactly like the round-1 driver."""
    assert plain.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true"
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL|TIMESTAMP"):
        plain.read.parquet(f"{sf_dir}/events.parquet").collect()


def test_entry_runs_under_plain_session(plain):
    df = driver_entry.entry(plain)
    assert df.count() > 0


@pytest.mark.parametrize("name", EVENTS_BATCH_QUERIES)
def test_events_query_under_plain_session(plain, sf_dir, name):
    df = driver_entry.queries()[name](plain, sf_dir)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_streaming_query_under_plain_session(plain, sf_dir):
    df = driver_entry.queries()["q52_streaming_hourly_rollup"](plain, sf_dir)
    assert df.count() > 0
