"""Sources & sinks.

The MapReduce model's I/O surface is "input splits of files in, part files
out" (OSDI'04 §3.1). Spark-native equivalent: format readers that hand
Catalyst a pruned, filtered columnar scan, and partitioned writers.

Scale notes (100 TB):
- ``load`` goes through ``spark.read.parquet`` so column pruning and
  predicate pushdown reach the scan (verified in tests/test_plans.py).
- ``write_*`` helpers accept ``partition_by`` so downstream reads get
  partition pruning; at cluster scale output would also be bucketed on the
  dominant join key (bucketing needs a metastore table — documented here,
  exercised where the local FS allows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at ANY scale factor (region and
#: nation are fixed-size; part/supplier/customer grow with SF and must NOT be
#: assumed broadcastable at 100 TB — AQE decides for those).
ALWAYS_BROADCAST = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond TimestampType regardless of
    how the parquet file encoded it.

    Driver-generated fixtures have shipped two encodings across rounds:
    TIMESTAMP(NANOS) — which Spark 4 only reads as raw longs via
    ``nanosAsLong``, rebuilt here with the same floor division DuckDB applies
    — and plain TIMESTAMP (µs, isAdjustedToUTC=false), which Spark reads as
    TIMESTAMP_NTZ. Both collapse to TimestampType under the UTC session tz
    (session.py), so oracle comparisons see identical values either way
    (SURVEY.md §7.3.2).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(t, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: Session-scoped memo of source DataFrames, keyed by (application id,
#: sf_dir, table). ``spark.read.parquet`` lists the path and reads footers
#: to infer the schema on EVERY call — measured 80-140 ms per repeat load
#: at sf0.1, which across a few hundred load calls in a full bench sweep
#: is tens of seconds of pure metadata re-derivation. A resident engine
#: holds exactly this in its catalog (a metastore table's schema +
#: snapshot), so the memo is the honest steady state: DataFrames are
#: immutable and every caller composes fresh transforms on the shared
#: leaf, so lineage/caching semantics are unchanged. Keyed per (session,
#: sf_dir, table); each entry stores (path fingerprint, frame) where the
#: fingerprint is (mtime_ns, size) of the table path (ADVICE r11): a
#: harness that regenerates fixture files into the same sf_dir mid-session
#: bumps the mtime, the fingerprint mismatches, and the entry is REPLACED
#: (re-listing the files) instead of silently serving the stale snapshot —
#: and superseded snapshots are evicted, not accumulated. Cleared through
#: the cache registry with the other session memos.
_TABLE_MEMO: dict[tuple, tuple] = {}


def _path_fingerprint(path: str) -> tuple:
    """Staleness fingerprint of ``path`` for the table memo: the path's own
    (mtime_ns, size) plus, for a directory, the max (name, mtime_ns, size)
    over its direct entries (ADVICE r12: an in-place overwrite of a part
    file's CONTENTS changes the file's mtime but not the directory's, so
    the directory stat alone can serve a stale file-listing snapshot).
    One shallow scandir — no recursion; Spark table dirs are flat.
    Non-local paths (s3://, hdfs://) stat-fail and fall back to a
    constant — memo-forever, matching a catalog's snapshot pinning."""
    import os

    try:
        st = os.stat(path)
        entries: tuple = ()
        if os.path.isdir(path):
            with os.scandir(path) as it:
                newest = None
                for e in it:
                    try:
                        es = e.stat()
                    except OSError:
                        continue
                    key = (es.st_mtime_ns, e.name, es.st_size)
                    if newest is None or key > newest:
                        newest = key
                entries = (newest,)
        return (st.st_mtime_ns, st.st_size) + entries
    except OSError:
        return ("unstattable",)


def _clear_table_memo() -> int:
    n = len(_TABLE_MEMO)
    _TABLE_MEMO.clear()
    return n


from ..cache import register_memo_clearer  # noqa: E402

register_memo_clearer(_clear_table_memo)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md).

    ``events`` gets its ``ts`` column normalized to TimestampType (µs) —
    see :func:`normalize_events_ts` for the two fixture encodings handled.
    Frames are memoized per (session, sf_dir, table) — see _TABLE_MEMO.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = table_path(sf_dir, name)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    fp = _path_fingerprint(path)
    memo = _TABLE_MEMO.get(key)
    if memo is not None and memo[0] == fp:
        return memo[1]
    # fingerprint changed (fixture rewritten in place): REPLACE the entry
    # rather than keying on the fingerprint, so superseded snapshots are
    # evicted instead of accumulating one dead DataFrame per rewrite.
    if name == "events":
        # harmless when ts is already µs; required to read NANOS fixtures
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    _TABLE_MEMO[key] = (fp, df)
    return df


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw text-line input — the MapReduce-native input format."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json_skip_bad(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON reader with bad-record capture — the Spark-native form of the
    MapReduce model's "Skipping Bad Records" machinery (OSDI'04 §5.3:
    deterministic crashes on individual records must not kill the job).

    PERMISSIVE mode parses what it can; rows that fail the schema land
    intact in ``_corrupt_record`` instead of failing the task, so the
    pipeline can count / quarantine them (a production job writes them to
    a dead-letter path and alerts on the rate). Spark's alternatives are
    DROPMALFORMED (silent — rejected here: silent data loss at 100 TB is
    how corpora rot) and FAILFAST (for sources contractually required to
    be clean).
    """
    from pyspark.sql.types import StringType, StructType

    if isinstance(schema, StructType) and "_corrupt_record" not in schema.names:
        schema = schema.add("_corrupt_record", StringType())
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
