"""Round-11 algebraic properties: the IVF-celled bitext miner's
relationship to its brute-force baseline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.operators import similarity


def _sides(spark, sf_dir):
    from building_energy_data_pipeline_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings")
    je = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        "vec_id", "lang", "embedding"
    )
    return (
        je.filter(F.expr("lang = 'en'")),
        je.filter(~F.expr("lang = 'en'")),
        emb,
    )


class TestBitextIvfAlgebra:
    def test_single_cell_equals_cross_join_exactly(self, spark, sf_dir):
        """With ONE centroid every vector lands in the same cell, so
        the IVF candidate set IS the full cross product and the two
        miners must agree row-for-row — the margin tail is shared
        code, so any disagreement is in the candidate generation."""
        src, tgt, emb = _sides(spark, sf_dir)
        cents = emb.filter(F.expr("vec_id = 0"))
        ivf = similarity.bitext_margin_ivf(
            src, tgt, cents, k_nn=4, nprobe=1
        )
        base = similarity.bitext_margin_topk(src, tgt, k_nn=4)
        a = sorted(map(tuple, ivf.collect()))
        b = sorted(map(tuple, base.collect()))
        assert a == b
        assert len(a) > 0

    def test_cell_restriction_never_invents_pairs(self, spark, sf_dir):
        """Every (src, tgt) the IVF miner emits must also be a
        positive-cosine candidate of the brute-force scan (IVF can
        MISS sources — unprobed cells — but never fabricate a
        pairing with a different target language or cosine)."""
        src, tgt, emb = _sides(spark, sf_dir)
        cents = emb.filter(F.expr("vec_id < 8"))
        ivf = similarity.bitext_margin_ivf(
            src, tgt, cents, k_nn=4, nprobe=2
        ).select("src_id", "tgt_id", "tgt_lang", "cos_micro")
        # recompute each emitted pair's cosine from the raw sides:
        # micro must match the brute-force fixed-pointing exactly
        s = src.select(
            F.col("vec_id").alias("src_id"),
            F.col("embedding").alias("sv"),
            F.expr(similarity.norm_expr("embedding")).alias("sn"),
        )
        t = tgt.select(
            F.col("vec_id").alias("tgt_id"),
            F.col("lang").alias("lang_t"),
            F.col("embedding").alias("tv"),
            F.expr(similarity.norm_expr("embedding")).alias("tn"),
        )
        cos = similarity.cosine_expr("tv", "sv", "tn", "sn")
        joined = (
            ivf.join(s, "src_id")
            .join(t, "tgt_id")
            .withColumn(
                "micro_direct",
                F.expr(
                    f"cast(floor(round({cos}, 6) * 1000000 + 0.5)"
                    " as bigint)"
                ),
            )
        )
        bad = joined.filter(
            (F.col("cos_micro") != F.col("micro_direct"))
            | (F.col("tgt_lang") != F.col("lang_t"))
            | (F.col("cos_micro") <= 0)
        )
        assert bad.count() == 0
        assert ivf.count() > 0
