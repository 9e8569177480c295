"""Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
vector (cosine top-k) rankers.

The standard two-tower retrieval pattern: a keyword ranker and an embedding
ranker each produce a k-sized candidate list, and RRF (Cormack et al.,
SIGIR 2009) fuses them with score = Σ 1/(60 + rank) — rank-based, so no
cross-ranker score calibration is needed.

Scale shape: each ranker's list is k rows (driver-small by construction),
so the fusion join is a trivial k×k full-outer merge — ALL the heavy
lifting happens inside the two ranked queries, which keep their own
documented plans (text_bm25_topk: query-term posting lists;
sim_topk_query: broadcast query vector + TakeOrderedAndProject). The
oracle composes the SAME two registered oracle SQLs as CTEs, so the fusion
is verified end-to-end over both rankers.

This module must import AFTER functions.text and functions.vectors (it
reads their registered oracles to build its own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import ORACLES, register
from .text import text_bm25_topk
from .vectors import sim_topk_query

#: RRF smoothing constant (the value from the original paper).
RRF_K = 60


@register(
    "hybrid_rrf_topk",
    oracle=f"""
    with bm as ({ORACLES["text_bm25_topk"]}),
    vec as ({ORACLES["sim_topk_query"]}),
    bmr as (select doc_id as id, rn as bm_rn from bm),
    vecr as (select vec_id as id,
                    row_number() over (order by score desc, vec_id) as vec_rn
             from vec)
    select id,
           round(coalesce(1.0 / ({RRF_K} + bm_rn), 0)
                 + coalesce(1.0 / ({RRF_K} + vec_rn), 0), 6) as rrf
    from bmr full outer join vecr using (id)
    order by rrf desc, id
    limit 10
    """,
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by reciprocal-rank fusion of BM25 (fixed term
    query) and cosine similarity (query vector vec_id 0), doc ids and vec
    ids sharing one id space.

    Both input rankings are already engine-stable (pre-rounded scores +
    id tiebreaks), and RRF scores are exact rationals summed identically on
    both engines, so the fused ranking inherits determinism end-to-end.
    """
    bm = text_bm25_topk(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("rn").alias("bm_rn")
    )
    vec = sim_topk_query(spark, sf_dir)
    # rank the k-row vector list (post-limit, so this window sees 10 rows)
    vec_w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    vecr = vec.withColumn("vec_rn", F.row_number().over(vec_w)).select(
        F.col("vec_id").alias("id"), "vec_rn"
    )
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("bm_rn")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vec_rn")), F.lit(0.0)),
        6,
    )
    return (
        bm.join(vecr, "id", "full_outer")
        .select("id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(10)
    )
