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
        # 8.98 s) — the suite's fixed cost is per-action scheduling, not
        # post-shuffle task width, so the default parallelism-first policy
        # stays (it is also the safer setting for the skew-heavy stages).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
