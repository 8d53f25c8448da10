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


def test_load_table_normalizes_ts_any_vintage(plain, sf_dir):
    """events.ts has shipped as TIMESTAMP(NANOS) (round 1-2) and as
    TIMESTAMP_NTZ micros (round 3). Whatever vintage the file is,
    ``load_table`` under a PLAIN session must deliver a session-zoned
    TimestampType ``ts`` — the type every downstream query (unix_micros,
    cast-to-long, window ranges) assumes."""
    from building_energy_data_pipeline_spark.sources.readers import load_table

    df = load_table(plain, sf_dir, "events")
    ts_type = dict(df.dtypes)["ts"]
    assert ts_type == "timestamp", ts_type
    # and the values are actually usable by unix_micros (the q07 crash)
    from pyspark.sql import functions as F

    row = df.select(F.max(F.unix_micros("ts")).alias("m")).first()
    assert row["m"] is not None and row["m"] > 0


def test_load_table_handles_nanos_vintage(plain, tmp_path):
    """The testdata has flip-flopped between TIMESTAMP(NANOS) (rounds
    1-2) and TIMESTAMP_NTZ micros (round 3). The live files are now
    micros, so synthesize a nanos-vintage events file with pyarrow and
    pin the LongType branch of _normalize_ts against regression."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from building_energy_data_pipeline_spark.sources.readers import (
        load_table,
        read_events_stream,
    )
    from pyspark.sql import functions as F

    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20 UTC in µs
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [(base_us + i * 1_000_000) * 1000 + 777 for i in range(3)],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    sf = tmp_path / "nanos_sf"
    sf.mkdir()
    # store_schema=False drops the arrow schema blob, so readers see
    # the raw parquet TIMESTAMP(NANOS) type like the round-1 driver did
    pq.write_table(table, sf / "events.parquet", store_schema=False)

    df = load_table(plain, str(sf), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["us"] for r in df.select(F.unix_micros("ts").alias("us")).collect()]
    # nanos truncate (not round) to micros, like CAST(ns AS TIMESTAMP)
    assert sorted(got) == [base_us + i * 1_000_000 for i in range(3)]

    stream = read_events_stream(plain, str(sf))
    assert dict(stream.dtypes)["ts"] == "timestamp"

    # the footer probe must report the true unit for both vintages —
    # it is what keeps the LongType branch from ever applying the
    # wrong scale factor silently (the round-2 failure class)
    from building_energy_data_pipeline_spark.sources.readers import (
        _parquet_ts_unit,
    )

    assert _parquet_ts_unit(str(sf / "events.parquet")) == "nanoseconds"


def test_parquet_ts_unit_probe_on_live_testdata(sf_dir):
    from building_energy_data_pipeline_spark.sources.readers import (
        _parquet_ts_unit,
    )

    assert _parquet_ts_unit(f"{sf_dir}/events.parquet") in (
        "nanoseconds",
        "microseconds",
    )
    assert _parquet_ts_unit(f"{sf_dir}/region.parquet") is None  # no ts
    assert _parquet_ts_unit("/nonexistent/x.parquet") is None


def test_stream_reader_matches_batch_schema(plain, sf_dir):
    """The readStream twin must emit the identical normalized schema."""
    from building_energy_data_pipeline_spark.sources.readers import (
        load_table,
        read_events_stream,
    )

    batch = load_table(plain, sf_dir, "events")
    stream = read_events_stream(plain, sf_dir)
    assert stream.schema == batch.schema


def test_entry_runs_under_plain_session(plain):
    df = driver_entry.entry(plain)
    assert df.count() > 0


@pytest.mark.parametrize("name", EVENTS_BATCH_QUERIES)
def test_events_query_under_plain_session(plain, sf_dir, name):
    df = driver_entry.queries()[name](plain, sf_dir)
    assert df.count() > 0
    assert len(df.columns) > 0


# the round-3 training-corpus family — newest entries in the driver's
# check window, so plain-session safety is pinned here like the
# events readers were in round 2
NEW_FAMILY_QUERIES = (
    "q83_sequence_packing",
    "q84_decontamination_overlap",
    "q85_token_dominance",
    "q86_boilerplate_ngrams",
    "q87_embedding_quantization",
    "q88_source_mixture",
    "q90_incremental_dedup",
    "q91_quantized_topk",
    "q92_corpus_curation",
    "q93_sink_roundtrip",
    "q94_footer_rowcounts",
    "q95_crossmodal_quality_norms",
)


@pytest.mark.parametrize("name", NEW_FAMILY_QUERIES)
def test_new_family_query_under_plain_session(plain, sf_dir, name):
    df = driver_entry.queries()[name](plain, sf_dir)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_streaming_rollup_matches_batch_counts(plain, sf_dir):
    """q52 under a plain session must produce the SAME number of hourly
    windows as the batch equivalent — this is the guard the round-2
    silent-wrongness (timestamps compressed 1000× by a stale hardcoded
    nanos schema → 10 windows instead of 3385) slipped past."""
    from building_energy_data_pipeline_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    df = driver_entry.queries()["q52_streaming_hourly_rollup"](plain, sf_dir)
    got = df.count()
    expected = (
        load_table(plain, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    assert got == expected, (got, expected)


def test_stateful_gap_tracker_matches_batch_keys(plain, sf_dir):
    """q64's per-key state must cover exactly the batch key space and
    agree with the relational lag/max gap on a spot-check key."""
    from building_energy_data_pipeline_spark.sources.readers import load_table
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    df = driver_entry.queries()["q64_stateful_gap_tracker"](plain, sf_dir)
    ev = load_table(plain, sf_dir, "events")
    expected_keys = ev.select("user_id", "event_type").distinct().count()
    assert df.count() == expected_keys
    # value parity: compare max_gap_us for every key against the batch fold
    w = W.partitionBy("user_id", "event_type").orderBy("ts")
    batch = (
        ev.withColumn("gap", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
        .groupBy("user_id", "event_type")
        .agg(F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_us"))
    )
    mismatches = (
        df.select("user_id", "event_type", "max_gap_us")
        .exceptAll(batch.select("user_id", "event_type", "max_gap_us"))
        .count()
    )
    assert mismatches == 0


# the round-4 family — the newest entries in the driver's check
# window; pinned for plain-session safety like the q83-q95 block
ROUND4_FAMILY_QUERIES = (
    "q96_streaming_dedup",
    "q97_repetition_filter",
    "q98_rag_chunking",
    "q99_bigram_lm",
    "q100_stream_stream_join",
    "q101_ivf_recall",
    "q102_audio_int_stats",
    "q103_jsonl_roundtrip",
    "q104_orc_roundtrip",
    "q105_merge_upsert",
    "q106_split_leakage",
    "q107_kmeans_step",
    "q108_zipf_coverage",
    "q109_pagerank_step",
    "q110_temperature_mixture",
    "q111_bucketed_join",
    "q112_duplicate_spans",
    "q113_span_excision",
    "q114_shuffle_shard",
    "q115_streaming_cdc_apply",
    "q116_join_key_skew",
)


@pytest.mark.parametrize("name", ROUND4_FAMILY_QUERIES)
def test_round4_query_under_plain_session(plain, sf_dir, name):
    df = driver_entry.queries()[name](plain, sf_dir)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_curated_window_holds_exactly_fifty_entries():
    """The driver's correctness harness checks the first 50 dict
    entries of queries(); the curated order must keep the documented
    position-50 boundary true. Round 4's first review found the
    window silently overflowed to 52 — this pins the invariant
    against the EXPLICIT sentinels plans/__init__.py exports
    (ADVICE r4 #3: no comment parsing — a reworded comment can no
    longer silently break or falsify the check)."""
    from building_energy_data_pipeline_spark.plans import (
        _CURATED_ORDER,
        DRIVER_WINDOW_SIZE,
        FIRST_BELOW_WINDOW,
        REGISTRY,
    )

    names = list(REGISTRY)
    # every registered query is explicitly curated (nothing appended
    # in stray registration order past the list)
    assert set(names) == set(_CURATED_ORDER)
    assert DRIVER_WINDOW_SIZE == 50  # the driver's documented prefix
    assert names.index(FIRST_BELOW_WINDOW) == DRIVER_WINDOW_SIZE, (
        f"window boundary drifted: {FIRST_BELOW_WINDOW} at "
        f"{names.index(FIRST_BELOW_WINDOW)}"
    )


def test_window_composition_matches_documented_counts():
    """The rotation comment's counts, DERIVED not hand-written
    (ADVICE r7 #3: two r7 sync commits each landed a different wrong
    hand-counted number). The round-12 window is documented as
    1 flagship + q263 (new: session-window state read) + q254
    (hierarchical-variant payload mix) + q262 (checkpoint-lifecycle
    change) + 27 r6-vintage drains (VERDICT r11 #1's tranche, led by
    the pinned sentinel q47) + 19 r7-vintage refreshes = 50."""
    from building_energy_data_pipeline_spark.plans import (
        DRIVER_WINDOW_SIZE,
        REGISTRY,
    )

    window = list(REGISTRY)[:DRIVER_WINDOW_SIZE]
    changed = [
        "q01_pricing_summary",
        "q263_session_state_read",  # new r12 (VERDICT r11 #5)
        "q254_jpeg_roundtrip",      # hierarchical-variant mix
        "q262_state_store_read",    # atexit ckpt sweep (ADVICE #4)
    ]
    assert window[: len(changed)] == changed
    # the 27 r6-vintage drains (VERDICT r11 #1: the next tranche;
    # membership is the CORRECTNESS files' frozen residue — every
    # row whose latest green driver entry was round 6)
    r6_set = {
        "q47_grouping_sets", "q48_range_join_bands",
        "q49_nation_intersect_except", "q50_topk_with_ties",
        "q51_approx_distinct", "q52_streaming_hourly_rollup",
        "q55_correlated_subqueries", "q56_salted_skew_join",
        "q57_full_outer_join", "q58_recursive_spine",
        "q59_explode_tokens", "q60_vector_norms",
        "q69_sql_unpivot", "q70_histogram", "q71_snapshot_diff",
        "q90_incremental_dedup", "q135_bpe_merge_step",
        "q136_bpe_train", "q139_bpe_transfer", "q152_pq_encode",
        "q153_ivf_pq", "q154_ivf_pq_recall", "q156_countmin_sketch",
        "q157_streaming_sketch_maintenance",
        "q158_approx_quantile_bound", "q159_bloom_join_prune",
        "q160_stream_enrich",
    }
    r6_drains = [n for n in window if n in r6_set]
    assert len(r6_drains) == 27
    assert "q47_grouping_sets" in r6_drains  # last round's sentinel
    # the oldest r7 rows fill the remainder
    r7_refreshes = [
        n for n in window if n not in r6_set and n not in changed
    ]
    assert len(r7_refreshes) == 19
    assert "q161_cdc_chunking" in r7_refreshes
    assert "q182_benford_audit" not in window  # the new sentinel
    assert (
        len(changed) + len(r6_drains) + len(r7_refreshes)
        == DRIVER_WINDOW_SIZE
    )
    # registry growth this round: q263 → 262 total (q89 reserved for
    # the protobuf-gated transformWithState twin, documented in
    # plans/__init__.py)
    assert len(REGISTRY) == 262
