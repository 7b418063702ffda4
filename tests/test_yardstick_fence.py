"""Exhaustive-yardstick fence (r9 VERDICT item 8): the three
definitionally quadratic operators — dedup_ngram_jaccard,
dedup_lsh_recall (via its exact side), dedup_embedding_recall — must
refuse LOUDLY above YARDSTICK_MAX_ROWS instead of grinding quadratically
against real data, and keep working untouched below it.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zylyty_data_engineer_challenge_spark.operators import dedup


def _big_corpus(spark, tmp_path, n_docs: int) -> str:
    sf = tmp_path / "sf"
    sf.mkdir()
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synthetic").alias("source"),
            F.length(F.concat(F.lit("w"), F.col("id").cast("string"))).alias(
                "n_chars"
            ),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(sf / "documents.parquet"))
    )
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.col("id") % 7).cast("float") for _ in range(4)]).alias(
                "embedding"
            ),
            F.lit(0).alias("label"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(sf / "embeddings.parquet"))
    )
    return str(sf)


def test_yardsticks_refuse_above_bound(spark, tmp_path):
    big = _big_corpus(spark, tmp_path, dedup.YARDSTICK_MAX_ROWS + 1)
    with pytest.raises(RuntimeError, match="exhaustive yardstick"):
        dedup.dedup_ngram_jaccard(spark, big)
    with pytest.raises(RuntimeError, match="exhaustive yardstick"):
        dedup.dedup_lsh_recall(spark, big)  # fenced via its exact side
    with pytest.raises(RuntimeError, match="exhaustive yardstick"):
        dedup.dedup_embedding_recall(spark, big)


def test_yardsticks_run_below_bound(spark, sf_dir):
    # the fixture corpora are far below the bound — the fence must be
    # invisible there (the driver grades these at sf0.01)
    assert dedup.dedup_ngram_jaccard(spark, sf_dir).count() >= 0
    assert dedup.dedup_embedding_recall(spark, sf_dir).count() == 1
