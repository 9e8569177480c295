"""Streaming sketches — the ingest-scale twins of the batch sketch QA
queries in operators/aggregations.py.

The batch count-min query (``agg_cms_heavy_hitters``) builds its sketch
from a per-key exact-count rollup because it exists to MEASURE the sketch
against exact counts. At 100 TB ingest there is no per-key rollup: every
arriving event updates its D cells directly and sketches merge by
element-wise sum. This module is that path — a plain streaming aggregation
over the shared ``cms_cells`` projection, no custom state, so Spark's
state store holds exactly D×W counters (4×1024 longs) regardless of key
cardinality or corpus size. ``tests/test_streaming.py`` proves the
bounded-replay sketch equals the batch-built one cell for cell, which is
the associativity claim the batch docstring makes, demonstrated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregations import cms_cells


def cms_sketch_stream(events: DataFrame) -> DataFrame:
    """(row_id, bucket, cell_count): the live count-min sketch of
    ``events.user_id`` as a streaming aggregation.

    Each event fans out to its D cells map-side (``cms_cells`` — pure
    projection, shared with batch) and the groupBy keeps one running sum
    per cell: state is the sketch itself, bounded at D×W rows forever.
    Replay in ``complete`` mode (the sketch is tiny); a production sink
    reads any key's estimate as min over its D cells' latest counts.
    """
    return (
        cms_cells(events.select("user_id"), "user_id")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )
