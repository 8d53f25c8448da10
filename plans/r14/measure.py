#!/usr/bin/env python
"""Round-14 measurement helper (guide §1): isolated per-query timing
with the noop sink + formatted-plan capture.

Usage:
  python plans/r14/measure.py time q90_incremental_dedup q28_minhash_lsh_pairs
  python plans/r14/measure.py plans before q90_incremental_dedup ...
  python plans/r14/measure.py plans after --all-headline

Timing protocol mirrors bench.py (release slots per query, 3 timed
runs, min + all samples printed) but runs ONLY the named queries so a
single query's measurement is not polluted by the rest of the bench.
Not part of the driver contract; bench.py is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from building_energy_data_pipeline_spark import caching  # noqa: E402
from building_energy_data_pipeline_spark.plans.queries import (  # noqa: E402
    HEADLINE,
    REGISTRY,
)
from building_energy_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.dirname(os.path.abspath(__file__))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_time(names: list[str], runs: int = 3, reps: int = 1) -> None:
    spark = get_spark(app_name="r14-measure")
    # warm the JVM once on a tiny table (same as bench.py)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    # untimed first-query warm-up absorbs first-session costs
    try:
        caching.release_caches()
        _noop(REGISTRY[names[0]].spark(spark, SF_DIR))
        caching.release_caches()
    except Exception as exc:  # noqa: BLE001
        print(f"warm-up failed: {exc}", file=sys.stderr)
    out: dict[str, dict] = {}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"r14-measure {name}")
            spec = REGISTRY[name]
            caching.release_caches()
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                _noop(spec.spark(spark, SF_DIR))
                samples.append(round(time.perf_counter() - t0, 4))
            rec = out.setdefault(name, {"samples": []})
            rec["samples"] += samples
            rec["min"] = min(rec["samples"])
    print(json.dumps(out, indent=1))
    spark.stop()


def cmd_plans(tag: str, names: list[str]) -> None:
    spark = get_spark(app_name="r14-plans")
    for name in names:
        caching.release_caches()
        df = REGISTRY[name].spark(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    caching.release_caches()
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    rest = sys.argv[2:]
    if cmd == "time":
        reps = 1
        if rest and rest[0].startswith("--reps="):
            reps = int(rest[0].split("=")[1])
            rest = rest[1:]
        cmd_time(rest, reps=reps)
    elif cmd == "plans":
        tag, rest = rest[0], rest[1:]
        if rest == ["--all-headline"]:
            rest = list(HEADLINE)
        cmd_plans(tag, rest)
    else:
        raise SystemExit(f"unknown command {cmd}")
