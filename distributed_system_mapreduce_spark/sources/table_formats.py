"""Lakehouse table-format connectors (Delta Lake / Apache Iceberg), gated.

Neither format's runtime jars nor Python bindings ship in this container, so
these helpers probe for availability at call time and raise a single,
actionable error when absent — the engine's public surface stays importable
everywhere. On a real cluster the only setup is the standard package +
catalog configs noted in each docstring (public Spark integration, e.g.
``io.delta:delta-spark`` / ``org.apache.iceberg:iceberg-spark-runtime``).

Why they matter at 100 TB: both formats replace directory listings with
transactional manifests (O(1) planning instead of an S3 LIST storm),
support ACID appends for the streaming ingest paths (streaming/dedup.py),
and expose file-level column stats that extend the same pushdown story the
parquet scans rely on (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableFormatUnavailable(RuntimeError):
    """The requested table format's runtime is not on this cluster."""


def _delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Read a Delta table (needs ``io.delta:delta-spark`` +
    ``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension``)."""
    if not _delta_available(spark):
        raise TableFormatUnavailable(
            "Delta Lake runtime not present; add the delta-spark package and "
            "session extension to the cluster config"
        )
    return spark.read.format("delta").load(path)


def write_delta(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    if not _delta_available(df.sparkSession):
        raise TableFormatUnavailable(
            "Delta Lake runtime not present; add the delta-spark package and "
            "session extension to the cluster config"
        )
    w = df.write.format("delta").mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Read an Iceberg table by catalog name (needs the
    ``iceberg-spark-runtime`` package and a configured catalog)."""
    if not _iceberg_available(spark):
        raise TableFormatUnavailable(
            "Iceberg runtime not present; add iceberg-spark-runtime and a "
            "spark.sql.catalog.<name> config"
        )
    return spark.read.format("iceberg").load(table)


def write_iceberg(df: DataFrame, table: str) -> None:
    if not _iceberg_available(df.sparkSession):
        raise TableFormatUnavailable(
            "Iceberg runtime not present; add iceberg-spark-runtime and a "
            "spark.sql.catalog.<name> config"
        )
    df.writeTo(table).createOrReplace()


def _avro_available(spark: SparkSession) -> bool:
    """Probe the DATA SOURCE lookup, not a classname: spark-sql ships some
    ``org.apache.spark.sql.avro`` classes for from_avro/to_avro even when
    the external spark-avro module (which registers the ``avro`` provider)
    is absent, so Class.forName false-positives. A schema'd load of a
    nonexistent path resolves the provider FIRST, then checks the path —
    so the provider is present exactly when the probe either succeeds or
    fails with PATH_NOT_FOUND (matched by error class, not message text:
    the find-data-source failure surfaces as a version-varying legacy
    class). Any other failure conservatively reports unavailable, so
    callers get the clean TableFormatUnavailable instead of a raw
    exception."""
    try:
        spark.read.format("avro").schema("probe int").load(
            "/nonexistent-avro-availability-probe"
        )
        return True
    except Exception as ex:
        cls = None
        for getter in ("getCondition", "getErrorClass"):
            fn = getattr(ex, getter, None)
            if fn is not None:
                try:
                    cls = fn()
                except Exception:
                    cls = None
                if cls:
                    break
        return cls == "PATH_NOT_FOUND"


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro files (needs the external ``spark-avro`` module — Avro has
    been an external data source since Spark 2.4; only the core avro jars
    ship with plain pyspark). Row-oriented Avro is the interchange format
    Kafka/connect pipelines emit; at rest, convert to parquet for columnar
    pruning (write_parquet) — this reader is the ingest edge."""
    if not _avro_available(spark):
        raise TableFormatUnavailable(
            "spark-avro module not present; add org.apache.spark:spark-avro "
            "to the cluster packages"
        )
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str) -> None:
    if not _avro_available(df.sparkSession):
        raise TableFormatUnavailable(
            "spark-avro module not present; add org.apache.spark:spark-avro "
            "to the cluster packages"
        )
    df.write.format("avro").mode("overwrite").save(path)
