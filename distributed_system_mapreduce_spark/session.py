"""SparkSession factory with scale-oriented defaults.

Single place for session config so tests, bench, and ad-hoc use agree:
- AQE on (runtime re-planning, skew-join handling, shuffle coalescing) —
  essential at 100 TB where static plans misestimate.
- UTC session timezone so timestamp round-trips are tz-invariant (testdata
  parquet timestamps are naive; SURVEY.md §7.3.2).
- Arrow-enabled pandas interchange for the few mapInPandas operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dsmr-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # make google.protobuf importable (vendored-runtime shim) BEFORE the
    # JVM exists: the transformWithState Python workers inherit PYTHONPATH
    # from the JVM environment, which is frozen at session creation
    # (pbcompat.ensure_protobuf is idempotent and a no-op when protobuf is
    # natively installed or no vendored runtime exists).
    from .pbcompat import ensure_protobuf

    ensure_protobuf()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core; on a real cluster this
        # would be sized to ~128-200 MB per post-shuffle partition and AQE
        # coalesces the rest.
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOT set: coalescePartitions.parallelismFirst=false + a small
        # advisory size (Spark's busy-cluster recommendation). Measured in
        # r11 on a 16-query tail sample: neutral at this scale (8.95 s ->
        # 8.98 s). RE-measured in r13 after the codegen-cache fix removed
        # recompilation as the dominant fixed cost (74-query subset at
        # sf0.1): 40.3 s -> 48.7 s with false+16MB — clearly WORSE, the
        # narrower post-shuffle stages serialize work that 32-wide tasks
        # overlap. The default parallelism-first policy stays (also the
        # safer setting for the skew-heavy stages).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Generated-class cache (CodeGenerator.cache, keyed by codegen
        # source). The default maxEntries=100 is sized for a handful of
        # resident queries; this engine's suite compiles hundreds of
        # distinct whole-stage-codegen units per sweep, so at the default
        # every sweep evicts and recompiles nearly everything — measured
        # r13 on the 13-query graph family at sf0.1: 21.8-26.6 s at the
        # default vs 15.6 s at 5000 (bfs 3.37->2.14 s, pagerank
        # 3.04->1.63 s, identical results). Entries are compiled class
        # holders (~KBs); 5000 is ~tens of MB, noise on an 8 GiB driver.
        # On a real cluster the same conf ships to executors and has the
        # same effect for a resident multi-query engine.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # PySpark's DataFrame-debugging origin capture (default true)
        # wraps EVERY Column/DataFrame op in call-site bookkeeping: one
        # conf RTT + PySparkCurrentOrigin.set/clear RTTs on the gateway,
        # a Python stack walk, and a retried-and-failed IPython import
        # per op. Measured r16 (guide §4, plan construction): ~1.1-1.7 ms
        # per Column op with it on vs ~0.1 ms off — ~41 s of pure
        # plan-build time across one 237-query sweep. Diagnostic-only
        # (error messages lose the user line number); results identical.
        # Scale-independent: this is Python-driver overhead, the same on
        # a laptop or a 1000-node cluster.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
