"""Round-13 probe: is graph_bfs_hops' per-level repartition redundant?

VERDICT r12 #2 — apply the k-core lesson (ad13a3b) to graph_bfs_hops:
measure the current per-level `repartition(level_parts, "node") -> distinct`
against a plain `distinct()` (one AQE-coalesced exchange per level) and a
`coalesce`-free variant, all producing identical hashes.

Run:  python tools/probe_bfs_r13.py  (sf0.1, local[$SPARK_GRAFT_CPUS])
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from distributed_system_mapreduce_spark.session import get_spark
from distributed_system_mapreduce_spark.operators.graph import (
    BFS_HOPS,
    copurchase_pairs,
)
from distributed_system_mapreduce_spark.cache import track

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _edges(spark):
    pairs = copurchase_pairs(spark, SF)
    return pairs, track(
        pairs.union(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )


def _finish(levels):
    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.unionAll(lv)
    dist = all_levels.groupBy("node").agg(F.min("hop").alias("hop"))
    return dist.groupBy(F.col("hop").cast("int").alias("hop")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("node").cast("bigint").alias("node_checksum"),
    )


def bfs_current(spark) -> DataFrame:
    pairs, edges = _edges(spark)
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    level_parts = max(1, min(default_parts, 2 * pairs.count() // 200_000 + 1))
    src0 = edges.agg(F.min("src").alias("node"))
    frontier = src0
    levels = [src0.select("node", F.lit(0).alias("hop"))]
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .repartition(level_parts, "node")
            .distinct()
        )
        levels.append(frontier.select("node", F.lit(hop).alias("hop")))
    return _finish(levels)


def bfs_plain_distinct(spark) -> DataFrame:
    """Drop the explicit repartition: distinct() itself hash-places on node
    and AQE coalesces the exchange."""
    pairs, edges = _edges(spark)
    src0 = edges.agg(F.min("src").alias("node"))
    frontier = src0
    levels = [src0.select("node", F.lit(0).alias("hop"))]
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        levels.append(frontier.select("node", F.lit(hop).alias("hop")))
    return _finish(levels)


def bfs_rebalance(spark) -> DataFrame:
    """AQE REBALANCE hint instead of the manual repartition: the exchange is
    auto-coalesced to the advisory size, and no pairs.count() sizing job."""
    pairs, edges = _edges(spark)
    src0 = edges.agg(F.min("src").alias("node"))
    frontier = src0
    levels = [src0.select("node", F.lit(0).alias("hop"))]
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .hint("rebalance", "node")
            .distinct()
        )
        levels.append(frontier.select("node", F.lit(hop).alias("hop")))
    return _finish(levels)


def bfs_coalesced_distinct(spark) -> DataFrame:
    """distinct first (map-side partial dedup), then coalesce the tiny
    frontier for the next join — exchange carries deduped rows."""
    pairs, edges = _edges(spark)
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    level_parts = max(1, min(default_parts, 2 * pairs.count() // 200_000 + 1))
    src0 = edges.agg(F.min("src").alias("node"))
    frontier = src0
    levels = [src0.select("node", F.lit(0).alias("hop"))]
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .repartition(level_parts, "node")
            .distinct()
            .coalesce(level_parts)
        )
        levels.append(frontier.select("node", F.lit(hop).alias("hop")))
    return _finish(levels)


def bfs_narrow_rollup(spark) -> DataFrame:
    """Current per-level shape, plus: the min-hop rollup over the union gets
    the same level_parts placement (union breaks partitioning, so the
    groupBy otherwise shuffles default-width), and the 4-row hop rollup
    runs single-partition instead of a 64-wide exchange."""
    pairs, edges = _edges(spark)
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    level_parts = max(1, min(default_parts, 2 * pairs.count() // 200_000 + 1))
    src0 = edges.agg(F.min("src").alias("node"))
    frontier = src0
    levels = [src0.select("node", F.lit(0).alias("hop"))]
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .repartition(level_parts, "node")
            .distinct()
        )
        levels.append(frontier.select("node", F.lit(hop).alias("hop")))
    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.unionAll(lv)
    dist = (
        all_levels.repartition(level_parts, "node")
        .groupBy("node")
        .agg(F.min("hop").alias("hop"))
    )
    return (
        dist.coalesce(1)
        .groupBy(F.col("hop").cast("int").alias("hop"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("bigint").alias("node_checksum"),
        )
    )


VARIANTS = {
    "current": bfs_current,
    "narrow_rollup": bfs_narrow_rollup,
    "current2": bfs_current,
    "narrow_rollup2": bfs_narrow_rollup,
}


def main() -> None:
    spark = get_spark("probe-bfs")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(VARIANTS)
    # one cold pass to build caches + JIT
    rows0 = None
    for name in names:
        rows = sorted(map(tuple, VARIANTS[name](spark).collect()))
        rows0 = rows0 or rows
        assert rows == rows0, f"{name} diverges"
    # interleaved warm reps: round-robin so host drift hits all variants
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(8):
        for name in names:
            t0 = time.monotonic()
            VARIANTS[name](spark).collect()
            times[name].append(time.monotonic() - t0)
    for name in names:
        ts = sorted(times[name])
        med = ts[len(ts) // 2]
        print(
            f"{name:16s} min={ts[0]:5.2f}s med={med:5.2f}s "
            f"all={[round(t, 2) for t in times[name]]}"
        )
    print("all variants identical results")


if __name__ == "__main__":
    main()
