"""Streaming decontamination — the online twin of
operators/curation.py:corpus_decontaminate.

An append-only ingest must flag eval-contaminated documents AS THEY ARRIVE,
not in a nightly batch over the whole corpus. The eval suite is static and
small, so the streaming form needs no state for the check itself: per-doc
5-gram shingles are computed map-side (the same ``shingle_expr`` the batch
path uses), semi-joined against the broadcast eval shingle table
(stream-static joins are stateless on the stream side), and flagged doc_ids
are emitted once via the built-in stateful distinct. State = one id per
flagged doc — the minimum any exactly-once flagger can hold.

On bounded replay the flagged set equals the batch query's exactly
(asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import _EVAL_MOD, _doc_shingles, shingle_hash_frame
from ..sources.io import load


def eval_shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC distinct eval-split 5-gram shingles (batch side of the
    stream-static join) — built with the batch helper so both paths share
    one definition (and its tracked materialization)."""
    docs = load(spark, sf_dir, "documents")
    return (
        _doc_shingles(docs)
        .filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("shingle")
        .distinct()
    )


def decontam_flagged_stream(
    docs_stream: DataFrame, eval_shingles: DataFrame
) -> DataFrame:
    """doc_ids of train-side documents sharing >= 1 eval 5-gram, each
    emitted exactly once as it arrives."""
    sh = shingle_hash_frame(
        docs_stream.filter(F.col("doc_id") % _EVAL_MOD != 0)
    )
    return (
        sh.join(F.broadcast(eval_shingles), "shingle", "left_semi")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )
