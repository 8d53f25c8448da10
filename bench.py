#!/usr/bin/env python
"""Benchmark harness: times the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is executed to completion with a count-collapsing action
(``df.count()`` would let Spark skip projections, so we use
``write.format("noop")`` — full execution, no driver materialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from building_energy_data_pipeline_spark.plans.queries import HEADLINE, REGISTRY
from building_energy_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bedp-spark-bench")

    # Warm the JVM/codegen paths once on the smallest table so the
    # first timed query doesn't pay session startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    # three timed runs per query, keep the min: run 1 pays whole-stage
    # codegen compilation (~0.5-1 s/query, a constant that vanishes
    # at real scale); the min of the rest is the steady-state
    # per-query cost, robust to co-tenant noise on the machine.
    for name in HEADLINE:
        spec = REGISTRY[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # Ingest path (the reference's transform_data: wide→long melt →
    # parquet, src/data_transformation/data_transformer.py:367-389) —
    # its only published runtime metric is load throughput, so BENCH
    # carries one write-inclusive timing too. Min of 2 runs.
    import shutil
    import tempfile

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    out = tempfile.mkdtemp(prefix="bench_ingest_")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        (
            li.unpivot(
                ["l_orderkey", "l_linenumber"],
                ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
                "metric",
                "val",
            )
            .write.mode("overwrite")
            .parquet(out)
        )
        best = min(best, time.perf_counter() - t0)
    timings["ingest_melt_write"] = round(best, 4)
    shutil.rmtree(out, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
