#!/usr/bin/env python
"""10x scale-proof harness (VERDICT r10 #5): measure how the most
expensive headline queries GROW, not just how fast they are.

Two scratch datasets are synthesized with closed-form ``spark.range``
programs — ``m=1`` matches sf0.1's row counts and shapes, ``m=10`` is
ten times larger — and every probed query runs on both. Because both
legs come from the SAME generator, the wall-time and shuffle-byte
ratios are attributable to data volume alone (running the real sf0.1
parquet against a synthetic 10x leg would confound distribution
differences with growth). Nothing under /root/testdata is touched;
scratch parquet goes to a temp directory and is deleted afterwards.

Generator realism notes (each matters for the growth law being
honest):

- **documents**: ~50-token texts over the sf0.1 31-word pool, with a
  constant 5 % near-duplicate rate (doc ``20k+7`` shingle-copies doc
  ``20k+6`` minus its last token) — so TRUE near-dup pairs grow
  linearly with the corpus, the way real corpora grow (mostly new
  content), and an LSH whose pair count grows faster than that is
  exposed.
- **embeddings**: 64-dim vectors around ``97*m`` cluster directions —
  topic count grows with corpus size (real corpora add topics), so
  per-item neighborhood density stays constant and near-dup /
  ANN candidate growth should be ~linear for cell-pruned plans.
- **events**: same 42-day window at 10x the event density, users
  scale with m — the WAU/HLL register-table thesis (register rows
  bounded per day regardless of user cardinality) is exactly what
  the growth ratio tests.
- **lineitem**: ~4 lines/order, part space scales with m — the q173
  co-purchase graph keeps constant degree, so edges grow linearly
  and the degree-ordered wedge join should too.

Outputs a markdown table (stdout) and ``SCALEPROOF.json``. Run:

    python scaleproof.py            # m=1 vs m=10, the round artifact
    python scaleproof.py --mult 3   # quicker sanity
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

#: the probed queries: the expensive headline shapes whose scaling
#: story the engine stakes its 100 TB claim on. (name, registered?)
#: — registered entries run REGISTRY[name] verbatim. Historical
#: note: the q260/q129 rows were first measured when those queries
#: pinned k=8; both now scale k with the corpus at runtime (the
#: scalar-subquery oracle trick), so the "k_scaled" library rows
#: measure the same shape the registered queries execute, and the
#: fixed-k behavior survives only as the explicit ablation in the
#: candidate-pair counts.
PROBES = [
    "q28_minhash_lsh_pairs",
    "q90_incremental_dedup",
    "q129_semantic_dedup",
    "q234_greedy_coverage",
    "q153_ivf_pq",
    "q154_ivf_pq_recall",
    "q150_power_iteration",
    "q173_triangle_count",
    "q246_wau_hll_window",
    "q249_png_roundtrip",
    "q260_bitext_margin_ivf",
    "q155_bitext_margin_mining",
]

WORDS = [
    "batch", "part", "spark", "line", "column", "order", "small",
    "sort", "fast", "value", "scan", "a", "hash", "slow", "group",
    "agg", "filter", "join", "table", "query", "plan", "read",
    "write", "merge", "split", "shuffle", "cache", "row", "key",
    "map", "reduce",
]


def synth(spark, out_dir: str, m: int, tables: set | None = None) -> None:
    """Write documents/embeddings/events/lineitem parquet at ``m``
    times sf0.1's row counts, all closed-form from ``spark.range``.
    ``tables`` restricts generation (the m=100 candidate-pair tier
    needs only documents + embeddings)."""

    def wanted(t: str) -> bool:
        return tables is None or t in tables

    os.makedirs(out_dir, exist_ok=True)
    pool = "array(" + ", ".join(f"'{w}'" for w in WORDS) + ")"

    if wanted('documents'):
        # documents: 5000*m rows, ~50 tokens each; id%20==7 copies the
        # previous id's token sequence minus one token (constant near-dup
        # rate => linear true-pair growth)
        n_docs = 5000 * m
        base = "CASE WHEN id % 20 = 7 THEN id - 1 ELSE id END"
        length = f"40 + ({base}) * 2654435761 % 21"
        tail = "CASE WHEN id % 20 = 7 THEN 1 ELSE 0 END"
        # word index via murmur hash — NOT a linear congruence: a linear
        # form in (base, i) collapses mod 31 to one cyclic progression,
        # giving the whole corpus only 31 distinct shingles and a
        # degenerate everything-matches-everything LSH (caught in the
        # mult-2 sanity run: q28 took 45 s on the m=1 leg vs ~1 s on the
        # real sf0.1 data)
        text = (
            f"array_join(transform(sequence(1, cast({length} - {tail} as int)),"
            f" i -> element_at({pool},"
            f" cast(pmod(hash(cast({base} as bigint), i), 31) as int) + 1)), ' ')"
        )
        (
            spark.range(n_docs)
            .repartition(32)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(text).alias("text"),
                F.expr(
                    "element_at(array('en','en','en','en','en','en','en','en',"
                    "'fr','fr','fr','es','es','es','de','de','de','zh','zh','zh'),"
                    " cast(id * 40503 % 20 as int) + 1)"
                ).alias("lang"),
                F.expr("concat('src', cast(id % 20 as string))").alias("source"),
            )
            .withColumn("n_chars", F.length("text"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "documents.parquet"))
        )

    if wanted('embeddings'):
        # embeddings: 2000*m rows, 64-dim float32 around 97*m cluster
        # directions + per-id jitter (topics scale with the corpus)
        n_emb = 2000 * m
        n_clusters = 97 * m
        emb = (
            f"transform(sequence(0, 63), j -> cast("
            f" sin((id * 2654435761 % {n_clusters}) * 0.61 + j * 0.37) * 0.9"
            f" + sin(id * 1.7 + j * 0.91) * 0.15 as float))"
        )
        (
            spark.range(n_emb)
            .repartition(32)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(emb).alias("embedding"),
                F.expr("cast(id % 10 as int)").alias("label"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "embeddings.parquet"))
        )

    if wanted('events'):
        # events: 100000*m rows across the same 42-day window (density
        # scales, horizon does not), users scale with m
        n_events = 100_000 * m
        span_us = 42 * 86_400 * 1_000_000
        (
            spark.range(n_events)
            .repartition(32)
            .select(
                F.col("id").alias("event_id"),
                F.expr(
                    f"timestampadd(MICROSECOND,"
                    f" cast(id * cast({span_us} as double) / {n_events} as bigint),"
                    f" timestamp_ntz'2024-01-01 00:00:00')"
                ).alias("ts"),
                F.expr(f"cast(id * 2654435761 % {1500 * m} as bigint)").alias(
                    "user_id"
                ),
                F.expr(
                    "element_at(array('view','click','signup','purchase','error'),"
                    " cast(id * 7919 % 5 as int) + 1)"
                ).alias("event_type"),
                F.expr("round(cast(id * 104729 % 20000 as double) / 100, 2)").alias(
                    "value"
                ),
                F.expr(
                    "concat('{\"k\": ', cast(id % 100 as string), '}')"
                ).alias("props"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "events.parquet"))
        )

    if wanted('lineitem'):
        # lineitem (q173's columns): ~4 lines/order, part space 20000*m —
        # constant co-purchase degree, linear edge growth
        n_lines = 600_000 * m
        (
            spark.range(n_lines)
            .repartition(32)
            .select(
                F.expr("cast(id / 4 as bigint)").alias("l_orderkey"),
                F.expr(
                    f"cast(id * 2654435761 % {20_000 * m} as bigint)"
                ).alias("l_partkey"),
                F.expr(
                    "date_add(date'1995-01-01', cast(id * 40503 % 2500 as int))"
                ).alias("l_shipdate"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "lineitem.parquet"))
        )



def _run(spark, fn, sf_dir: str) -> dict:
    """Execute once, returning wall seconds + summed shuffle bytes
    (Exchange ``shuffleBytesWritten`` SQLMetrics — the same numbers
    the Spark UI shows)."""
    from building_energy_data_pipeline_spark import caching
    from building_energy_data_pipeline_spark.ops.observe import (
        explain_analyze,
    )

    caching.release_caches()
    r = explain_analyze(fn(spark, sf_dir))
    shuffle_bytes = sum(
        op["metrics"].get("shuffleBytesWritten", 0)
        for op in r["operators"]
    )
    caching.release_caches()
    return {
        "sec": round(r["duration_s"], 3),
        "shuffle_mb": round(shuffle_bytes / 1e6, 3),
        "rows": r["result"],
    }


def _streaming_probes(spark, sf_dir: str) -> dict:
    """Drain three stateful streaming shapes over the leg's events
    and record the state-store footprint (VERDICT r11 #7):

    - ``windowed_rollup`` — 1-day tumbling window x event_type
      count/sum (q52/q252's rollup stage): state rows = windows x
      groups, CONSTANT as event density grows.
    - ``wau_approx_distinct`` — 7-day sliding window
      approx_count_distinct(user_id) (q246's shape): state rows =
      windows; sketch registers bound the per-row size even as the
      user population grows 10x.
    - ``dedup_ids`` — dropDuplicates on event_id under a watermark
      (q96/q252's dedup stage): the honest contrast — keys ARE event
      ids, so state tracks the in-horizon event volume; at true
      scale the watermark horizon (not history) bounds it.

    Metrics per probe: final-progress stateOperators totals
    (``numRowsTotal``, ``stateMemory`` bytes), summed RocksDB custom
    metrics, and the checkpoint's changelog file count (changelog
    checkpointing is ON — per-batch deltas, not snapshots)."""
    import glob as _glob

    from building_energy_data_pipeline_spark.streaming.statestore import (
        enable_rocksdb_state,
        restore_state_conf,
    )

    events = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(sf_dir, "events.parquet")
            ).schema
        )
        .parquet(os.path.join(sf_dir, "events.parquet"))
        # the generator writes TIMESTAMP_NTZ (the testdata vintage);
        # watermarks need the session-zoned type
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    probes = {
        "windowed_rollup": (
            events.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s")),
            "update",
        ),
        "wau_approx_distinct": (
            events.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "7 days", "1 day"))
            .agg(F.approx_count_distinct("user_id").alias("wau")),
            "update",
        ),
        "dedup_ids": (
            events.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .groupBy("event_type")
            .agg(F.count("*").alias("n")),
            "update",
        ),
    }
    out: dict[str, dict] = {}
    previous = enable_rocksdb_state(spark)
    try:
        for name, (df, mode) in probes.items():
            ck = tempfile.mkdtemp(prefix=f"scaleproof_{name}_")
            try:
                # drain wall (r14, VERDICT r13 #9): time from .start()
                # to terminated — the availableNow end-to-end drain,
                # checkpoint dir creation excluded (mkdtemp above),
                # the streaming family's first measured perf baseline.
                t0 = time.time()
                q = (
                    df.writeStream.format("noop")
                    .outputMode(mode)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                if not q.awaitTermination(600):
                    q.stop()
                    raise TimeoutError(f"{name} did not drain")
                drain_wall = round(time.time() - t0, 3)
                prog = q.lastProgress or {}
                rows = removed = mem = 0
                for op in prog.get("stateOperators", []):
                    rows += int(op.get("numRowsTotal", 0))
                    removed += int(op.get("numRowsRemoved", 0))
                    mem += int(op.get("memoryUsedBytes", 0) or 0)
                from building_energy_data_pipeline_spark.streaming.statestore import (  # noqa: E501
                    rocksdb_metrics,
                )

                rdb = rocksdb_metrics(q)
                changelogs = len(
                    _glob.glob(
                        os.path.join(ck, "state", "**", "*.changelog"),
                        recursive=True,
                    )
                )
                out[name] = {
                    "drain_wall_sec": drain_wall,
                    # survivors after the final watermark GC — the
                    # key-cardinality-in-horizon number
                    "state_rows": rows,
                    # evicted in the final batch — proof GC ran
                    "rows_removed_last_batch": removed,
                    "state_memory_bytes": mem,
                    "rocksdb_bytes_written": rdb.get(
                        "rocksdbTotalBytesWritten", 0
                    ),
                    "changelog_files": changelogs,
                    "batches": int(prog.get("batchId", -1)) + 1,
                }
            finally:
                shutil.rmtree(ck, ignore_errors=True)
    finally:
        restore_state_conf(spark, previous)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=2,
                    help="runs per leg; min wall is kept")
    args = ap.parse_args()

    from building_energy_data_pipeline_spark.plans import REGISTRY
    from building_energy_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bedp-scaleproof")
    scratch = tempfile.mkdtemp(prefix="scaleproof_")
    legs = {1: os.path.join(scratch, "m1"),
            args.mult: os.path.join(scratch, f"m{args.mult}")}
    try:
        for m, d in legs.items():
            t0 = time.time()
            synth(spark, d, m)
            print(f"synth m={m}: {time.time() - t0:.1f}s -> {d}",
                  file=sys.stderr)

        probes = {n: REGISTRY[n].spark for n in PROBES}
        # the bitext pair at DEPLOYMENT cell counts (k grows with the
        # data; the registered q260 pins k=8 for oracle tractability)
        from building_energy_data_pipeline_spark.operators import (
            similarity,
        )
        from building_energy_data_pipeline_spark.plans.training_queries import (
            BITEXT_KNN,
            BITEXT_NPROBE,
            BITEXT_SRC_PRED,
        )

        def _bitext_sides(spark, sf_dir):
            from building_energy_data_pipeline_spark.sources.readers import (
                load_table,
            )
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang")
            emb = load_table(spark, sf_dir, "embeddings")
            je = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
                "vec_id", "lang", "embedding")
            return (je.filter(F.expr(BITEXT_SRC_PRED)),
                    je.filter(~F.expr(BITEXT_SRC_PRED)), emb)

        def bitext_ivf_scaled_k(spark, sf_dir):
            # k = 8*m: the same corpus-proportional sizing the
            # registered q260 now evaluates at runtime
            mm = max(1, round(
                spark.read.parquet(
                    os.path.join(sf_dir, "embeddings.parquet")
                ).count() / 2000))
            src, tgt, emb = _bitext_sides(spark, sf_dir)
            centroids = emb.filter(F.expr(f"vec_id < {8 * mm}"))
            return similarity.bitext_margin_ivf(
                src, tgt, centroids,
                k_nn=BITEXT_KNN, nprobe=BITEXT_NPROBE,
                slot="scaleproof.bitext_scaled")

        probes["bitext_ivf_k_scaled"] = bitext_ivf_scaled_k

        def semdedup_k_scaled(spark, sf_dir):
            """q129's blocked pair scan at the DEPLOYMENT cluster
            count (k = 8*m, the SemDeDup k ~ n/target_cluster_size
            sizing rule; the registered q129 pins k=8 only because
            its oracle unrolls the k-means training loop in SQL).
            Seed centroids stand in for the trained ones — the plan
            shape under test (cell equi-join + in-cell pairs) is
            identical."""
            from building_energy_data_pipeline_spark.operators.similarity import (
                assign_centroids,
                cosine_expr,
            )
            from building_energy_data_pipeline_spark.plans.training_queries import (
                SEMDEDUP_MIN_COS,
            )
            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet"))
            mm = max(1, round(emb.count() / 2000))
            cents = emb.filter(F.expr(f"vec_id < {8 * mm}"))
            assigned = assign_centroids(emb, cents).select(
                "vec_id", "centroid_id", "embedding", "vnorm")
            a = assigned.select(
                "centroid_id", F.col("vec_id").alias("id_a"),
                F.col("embedding").alias("va"), F.col("vnorm").alias("na"))
            b = assigned.select(
                "centroid_id", F.col("vec_id").alias("id_b"),
                F.col("embedding").alias("vb"), F.col("vnorm").alias("nb"))
            pairs = (
                a.join(b, "centroid_id")
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("cos", F.round(
                    F.expr(cosine_expr("va", "vb", "na", "nb")), 6))
                .filter(F.col("cos") >= SEMDEDUP_MIN_COS)
            )
            return pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
                F.min("id_a").alias("dup_of"),
                F.max("cos").alias("max_cos"))

        probes["semdedup_k_scaled"] = semdedup_k_scaled

        def candidate_pairs(spark, sf_dir) -> dict:
            """The machine-independent witness: exact candidate-pair
            counts for the three bitext shapes (cross join; cells at
            the registered k=8; cells at deployment k=8*m)."""
            from building_energy_data_pipeline_spark.operators.similarity import (
                assign_centroids,
            )
            src, tgt, emb = _bitext_sides(spark, sf_dir)
            n_s, n_t = src.count(), tgt.count()
            out = {"cross": n_s * n_t}
            mm = max(1, round(emb.count() / 2000))
            for label, k in (("cells_k_fixed", 8),
                             ("cells_k_scaled", 8 * mm)):
                out[f"{label}_k"] = k
                cents = emb.filter(F.expr(f"vec_id < {k}"))
                t = assign_centroids(tgt, cents).select(
                    F.col("vec_id").alias("tgt_id"), "centroid_id")
                s = assign_centroids(
                    src, cents, nprobe=BITEXT_NPROBE
                ).select(F.col("vec_id").alias("src_id"), "centroid_id")
                out[label] = t.join(s, "centroid_id").count()
            return out

        # absorb python-worker / codegen spin-up before any timing
        # (bench.py's warm-up lesson: the first Arrow stage otherwise
        # bills ~20 s of startup to whichever probe runs first)
        import pandas as pd  # noqa: F401

        spark.range(1000).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()

        results: dict[str, dict] = {}
        pair_counts = {
            f"m{m}": candidate_pairs(spark, d) for m, d in legs.items()
        }
        # the 100x tier (VERDICT r11 #2): candidate-pair COUNTS only —
        # no query execution, just the cell assignment + join count on
        # a documents+embeddings-only leg — the machine-independent
        # witness that the k-scaled exponent stays ~1 two decades up
        if args.mult >= 10:
            m100_dir = os.path.join(scratch, "m100")
            t0 = time.time()
            synth(spark, m100_dir, 100,
                  tables={"documents", "embeddings"})
            print(f"synth m=100 (docs+emb): {time.time() - t0:.1f}s",
                  file=sys.stderr)
            pair_counts["m100"] = candidate_pairs(spark, m100_dir)
            shutil.rmtree(m100_dir, ignore_errors=True)
        print(f"candidate pairs: {pair_counts}", file=sys.stderr)

        # streaming state growth (VERDICT r11 #7): drain stateful
        # streams over both legs and record the state-store footprint
        # from the final progress — the 100 TB claim for the GC-ing
        # queries is that state tracks KEY CARDINALITY (windows x
        # groups, registers per day), not event volume
        streaming = {
            f"m{m}": _streaming_probes(spark, d)
            for m, d in legs.items()
        }
        print(f"streaming state: {streaming}", file=sys.stderr)
        for name, fn in probes.items():
            results[name] = {}
            for m, d in legs.items():
                best = None
                for _ in range(args.repeat):
                    r = _run(spark, fn, d)
                    if best is None or r["sec"] < best["sec"]:
                        best = r
                results[name][f"m{m}"] = best
                print(f"{name} m={m}: {best}", file=sys.stderr)

        mult = args.mult
        print(f"\n| query | m=1 sec | m={mult} sec | wall x | "
              f"m=1 shuffle MB | m={mult} shuffle MB | shuffle x |")
        print("|---|---|---|---|---|---|---|")
        for name, r in results.items():
            a, b = r["m1"], r[f"m{mult}"]
            wx = round(b["sec"] / a["sec"], 2) if a["sec"] else float("nan")
            sx = (round(b["shuffle_mb"] / a["shuffle_mb"], 2)
                  if a["shuffle_mb"] else float("nan"))
            print(f"| {name} | {a['sec']} | {b['sec']} | {wx} | "
                  f"{a['shuffle_mb']} | {b['shuffle_mb']} | {sx} |")

        print("\nbitext candidate-pair counts (exact):")
        for leg, pc in pair_counts.items():
            print(f"  {leg}: {pc}")

        out = {
            "mult": mult,
            "results": results,
            "bitext_candidate_pairs": pair_counts,
            "streaming_state": streaming,
            # provenance IN the artifact (VERDICT r11 #2: the
            # pre-runtime-scaled-k history lived only in a code
            # comment and the stale rows contradicted the registered
            # plans)
            "provenance": {
                "generator": "scaleproof.py (this repo, same commit)",
                "q260_q261_note": (
                    "q260_bitext_margin_ivf and q129's scaled twin "
                    "q261 evaluate k = max(8, n // cell_target) AT "
                    "RUNTIME since commit 0d4750a; every row in this "
                    "file was measured against that registered "
                    "shape. q129_semantic_dedup deliberately pins "
                    "k=8 (its oracle unrolls the k-means training "
                    "in SQL) — it and q155's all-pairs cross join "
                    "are the PINNED-K / RECALL=1 ABLATIONS, kept to "
                    "show what the scaled shapes avoid."
                ),
                "m100_note": (
                    "the m100 bitext_candidate_pairs leg counts "
                    "cell-join candidates only (no query "
                    "execution) on a documents+embeddings-only "
                    "synthesis — the exponent witness at 100x."
                ),
                "streaming_note": (
                    "streaming_state drains each probe with "
                    "availableNow under the RocksDB provider and "
                    "records the final progress' stateOperators "
                    "totals plus checkpoint changelog file counts; "
                    "windowed_rollup and wau_approx_distinct are "
                    "key-cardinality-bounded (expect ~1x rows at "
                    "10x events), dedup_ids is the honest contrast "
                    "(keys = event ids, watermark-horizon bounded)."
                ),
            },
        }
        with open("SCALEPROOF.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print("\nwrote SCALEPROOF.json", file=sys.stderr)
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
