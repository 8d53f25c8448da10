"""Arrow-vectorized ANN scoring: agrees with the bit-exact
expression path within float tolerance, and is faster at bench scale
(not asserted — timing is environment-dependent; see README §scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
)


def test_arrow_topk_matches_expression_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, queries, k=3)
    arrow = brute_force_topk_arrow(emb, queries, k=3)
    j = exact.alias("e").join(
        arrow.alias("a"),
        (F.col("e.query_id") == F.col("a.query_id"))
        & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
        "full",
    )
    rows = j.select(
        F.col("e.query_id").alias("eq"),
        F.col("a.query_id").alias("aq"),
        F.col("e.cos").alias("ec"),
        F.col("a.cos").alias("ac"),
    ).collect()
    # every (query, neighbor) pair chosen by one path is chosen by the
    # other (rank flips only possible at exact cosine ties), and the
    # cosines agree to 1e-9
    for r in rows:
        assert r["eq"] is not None and r["aq"] is not None, f"pair mismatch: {r}"
        assert abs(r["ec"] - r["ac"]) < 1e-9


def test_arrow_scorer_handles_ragged_batches(spark):
    # mixed dimensions in one Arrow batch: zero-padding to the batch
    # max must leave dots and norms unchanged
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 2.0, 0.0]),
        (2, [3.0, 4.0]),
        (3, [1.0, 1.0, 1.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 0)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in brute_force_topk_arrow(emb, queries, k=3).collect()
    }
    # cos((1,0), (3,4)) = 3/5; cos with (0,2,0) = 0; cos with 1-vector = 0.5
    assert abs(got[(0, 2)] - 0.6) < 1e-9
    assert abs(got[(0, 1)] - 0.0) < 1e-9
    assert abs(got[(0, 3)] - 0.5) < 1e-9
