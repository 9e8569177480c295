"""ANN quality: measured recall of the approximate paths vs the exact
baseline, and Lloyd-trained IVF centroids vs the deterministic seed.

Recall@k = |approx top-k ∩ exact top-k| / k, averaged over query vectors.
These are quality regressions, not parity checks — the approximate paths
trade recall for scan cost and the tests pin the achieved trade-off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import distributed_system_mapreduce_spark  # noqa: F401
from distributed_system_mapreduce_spark.functions.vectors import (
    dot,
    lloyd_centroids,
    spread,
)
from distributed_system_mapreduce_spark.sources.io import load

from conftest import SF_DIR

K = 10
N_QUERIES = 30


@pytest.fixture(scope="module")
def emb_d(spark):
    return (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )


def _exact_topk(emb_d: DataFrame) -> DataFrame:
    """Exact cosine top-K per query vector (vec_id < N_QUERIES), brute force."""
    q = emb_d.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = spread(emb_d).join(
        F.broadcast(q), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        F.col("vec_id").alias("v_id"),
        F.round(dot(F.col("q_emb"), F.col("embedding")), 4).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("v_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("q_id", "v_id")
    )


def _assign(emb_d: DataFrame, cents: DataFrame) -> DataFrame:
    scored = spread(emb_d).crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cent_id",
        dot(F.col("embedding"), F.col("cent_emb")).alias("cscore"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cscore"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cent_id")
    )


def _ivf_topk(emb_d: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """IVF top-K per query vector probing the nprobe nearest cells."""
    assign = _assign(emb_d, cents)
    q = emb_d.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    probe = (
        q.crossJoin(F.broadcast(cents))
        .select("q_id", "q_emb", "cent_id", dot(F.col("q_emb"), F.col("cent_emb")).alias("s"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_emb", "cent_id")
    )
    scored = assign.join(F.broadcast(probe), "cent_id").filter(
        F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        F.col("vec_id").alias("v_id"),
        F.round(dot(F.col("q_emb"), F.col("embedding")), 4).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("v_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("q_id", "v_id")
    )


def _recall(exact: DataFrame, approx: DataFrame) -> float:
    hits = exact.join(approx, ["q_id", "v_id"], "left_semi").count()
    return hits / (N_QUERIES * K)


@pytest.fixture(scope="module")
def exact(emb_d):
    return _exact_topk(emb_d).cache()


def _seed_cents(emb_d: DataFrame) -> DataFrame:
    return emb_d.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )


def test_multiprobe_beats_single_probe(emb_d, exact):
    cents = _seed_cents(emb_d)
    r1 = _recall(exact, _ivf_topk(emb_d, cents, nprobe=1))
    r4 = _recall(exact, _ivf_topk(emb_d, cents, nprobe=4))
    assert r4 >= r1, (r1, r4)
    # 4/16 cells probed must find a real fraction of the exact top-k
    assert r4 >= 0.25, r4


def test_trained_centroids_do_not_regress(emb_d, exact):
    seed = _seed_cents(emb_d)
    trained = lloyd_centroids(emb_d, k=16, iters=3)
    r_seed = _recall(exact, _ivf_topk(emb_d, seed, nprobe=4))
    r_trained = _recall(exact, _ivf_topk(emb_d, trained, nprobe=4))
    # Lloyd balances the cells; recall at equal nprobe should hold or improve
    assert r_trained >= r_seed - 0.05, (r_seed, r_trained)


def test_lloyd_reduces_quantization_error(emb_d):
    """Training objective itself must improve: mean best-centroid cosine."""
    def mean_best(cents):
        return (
            _assign(
                emb_d,
                cents,
            )
            .join(cents, "cent_id")
            .select(dot(F.col("embedding"), F.col("cent_emb")).alias("s"))
            .agg(F.avg("s"))
            .collect()[0][0]
        )

    seed = _seed_cents(emb_d)
    trained = lloyd_centroids(emb_d, k=16, iters=3)
    assert mean_best(trained) > mean_best(seed)


def test_kmeans_parallel_trainer_matches_lloyd_quality(emb_d, exact):
    """k-means|| (pyspark.ml) is a drop-in trainer: same output contract,
    quantization objective at least as good as the deterministic seed, and
    IVF recall in the same band as the hand-rolled Lloyd trainer."""
    from distributed_system_mapreduce_spark.functions.vectors import (
        kmeans_parallel_centroids,
    )

    trained = kmeans_parallel_centroids(emb_d, k=16, max_iter=3)
    # output contract: same shape lloyd_centroids guarantees, unit-norm
    assert trained.columns == ["cent_id", "cent_emb"]
    norms = trained.select(
        F.sqrt(F.aggregate(
            F.transform("cent_emb", lambda x: x * x),
            F.lit(0.0),
            lambda s, x: s + x,
        )).alias("n")
    ).collect()
    assert all(abs(r.n - 1.0) < 1e-6 for r in norms)

    def mean_best(cents):
        return (
            _assign(emb_d, cents)
            .join(cents, "cent_id")
            .select(dot(F.col("embedding"), F.col("cent_emb")).alias("s"))
            .agg(F.avg("s"))
            .collect()[0][0]
        )

    seed = _seed_cents(emb_d)
    assert mean_best(trained) > mean_best(seed)

    # Measured at sf0.01: recall@10 nprobe=4 — lloyd 0.70, k-means|| 0.58.
    # Spherical Lloyd renormalizes centroids every iteration; MLlib's
    # Euclidean objective does not, which costs recall on unit-norm cosine
    # data. That is WHY lloyd_centroids stays the default trainer and
    # k-means|| is the large-k initializer alternative. Pin an absolute
    # floor well above the seeded-IVF bar (0.25) rather than parity.
    r_ml = _recall(exact, _ivf_topk(emb_d, trained, nprobe=4))
    assert r_ml >= 0.40, r_ml


def test_pq_adc_with_rerank_recall(spark):
    """Product quantization + exact re-rank must hold recall@10 >= 0.6 at
    fixture scale (measured ~0.75), and the whole pipeline — Lloyd
    codebooks, code assignment, ADC shortlist, re-rank — must be
    deterministic across runs. The registered query now emits the
    hash-checked bound row (r11); raw recall comes from _pq_hits."""
    from distributed_system_mapreduce_spark.functions.vectors import (
        PQ_RECALL_FLOOR,
        _pq_hits,
    )
    from distributed_system_mapreduce_spark.registry import QUERIES

    a = _pq_hits(spark, SF_DIR).collect()
    assert len(a) == 1
    recall = a[0].h / a[0].n_exact
    assert 0.6 <= recall <= 1.0
    b = _pq_hits(spark, SF_DIR).collect()
    assert a == b
    row = QUERIES["sim_pq_recall"](spark, SF_DIR).collect()[0]
    assert row.recall_floor_met == (recall >= PQ_RECALL_FLOOR)
    assert row.n_exact == a[0].n_exact


def test_ivfpq_composed_recall_floor(spark):
    """The composed production path (IVF probe -> ADC on candidates ->
    exact re-rank) must hold recall@10 >= 0.55 at fixture scale (measured
    0.6533) and may not EXCEED the IVF-only recall: ADC can only lose
    candidates within the probed lists, never add them. The registered
    query now emits the hash-checked bound row (VERDICT r10 #6); the raw
    recall comes from the shared _ivfpq_hits builder, and this test's
    floor is the TIGHT measured one (the oracle's IVFPQ_RECALL_FLOOR is
    the loose engine-portable claim)."""
    from distributed_system_mapreduce_spark.functions.vectors import (
        IVFPQ_RECALL_FLOOR,
        _ivfpq_hits,
    )
    from distributed_system_mapreduce_spark.registry import QUERIES

    hits = _ivfpq_hits(spark, SF_DIR).collect()
    assert len(hits) == 1
    r_composed = hits[0].h / hits[0].n_exact
    assert 0.55 <= r_composed <= 1.0
    r_ivf = QUERIES["sim_ann_recall"](spark, SF_DIR).collect()[0].recall
    assert r_composed <= r_ivf + 1e-9
    # and the registered bound row must agree with the raw measurement
    row = QUERIES["sim_ivfpq_recall"](spark, SF_DIR).collect()[0]
    assert row.recall_floor_met == (r_composed >= IVFPQ_RECALL_FLOOR)
    assert row.n_exact == hits[0].n_exact


def test_pq_codebooks_reduce_quantization_error(emb_d):
    """PQ-Lloyd training must not increase total squared quantization
    error vs the untrained seed codebooks (Lloyd is monotone)."""
    from distributed_system_mapreduce_spark.functions.vectors import (
        PQ_K,
        l2_sq,
        pq_assign,
        pq_codebooks,
        pq_subvectors,
    )

    e_named = emb_d.select("vec_id", F.col("embedding").alias("e"))
    sub = pq_subvectors(e_named)
    seed = pq_subvectors(e_named.filter(F.col("vec_id") < PQ_K)).select(
        "m", F.col("vec_id").alias("cent_id"), F.col("sv").alias("ce")
    )

    def total_err(cents):
        joined = pq_assign(sub, cents).join(cents, ["m", "cent_id"])
        return joined.agg(
            F.sum(l2_sq(F.col("sv"), F.col("ce"))).alias("e")
        ).collect()[0]["e"]

    trained = pq_codebooks(e_named)
    assert total_err(trained) <= total_err(seed) + 1e-9
