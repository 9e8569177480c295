"""Cross-SF and determinism invariants (SURVEY.md §5.2.5-6)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.sources.io import TABLES, load
from distributed_system_mapreduce_spark.testing import canonical_rows

from conftest import SF_DIR, SF_SMOKE

SF_BIG = "/root/testdata/sf0.1"


def test_row_counts_monotone_across_sf(spark):
    for t in TABLES:
        n_small = load(spark, SF_SMOKE, t).count()
        n_mid = load(spark, SF_DIR, t).count()
        n_big = load(spark, SF_BIG, t).count()
        assert n_small <= n_mid <= n_big, (t, n_small, n_mid, n_big)


def test_embedding_norms_unit(spark):
    from distributed_system_mapreduce_spark.functions.vectors import l2_norm

    stats = (
        load(spark, SF_DIR, "embeddings")
        .select(l2_norm(F.col("embedding")).alias("n"))
        .agg(F.min("n"), F.max("n"))
        .collect()[0]
    )
    assert abs(stats[0] - 1.0) < 1e-3 and abs(stats[1] - 1.0) < 1e-3


def test_word_count_total_equals_token_sum(spark):
    total_words = (
        QUERIES["word_count"](spark, SF_DIR).agg(F.sum("cnt")).collect()[0][0]
    )
    token_sum = (
        load(spark, SF_DIR, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_words == token_sum


@pytest.mark.parametrize(
    "name",
    ["topk_per_group", "window_lag_lead", "sim_topk_query", "dedup_ngram_jaccard",
     "window_session", "text_tfidf_top"],
)
def test_determinism_double_run(name, spark):
    """Order-sensitive queries must hash identically across runs."""
    a = canonical_rows(QUERIES[name](spark, SF_DIR).toPandas())
    b = canonical_rows(QUERIES[name](spark, SF_DIR).toPandas())
    assert a == b
