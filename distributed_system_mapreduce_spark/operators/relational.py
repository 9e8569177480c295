"""Scans, projection/filter, and the canonical MapReduce jobs (SURVEY.md §2.1-2.3).

Capability parity: the reference snapshot (/root/reference/) is an EMPTY
directory (SURVEY.md §0), so parity targets the published MapReduce model —
Dean & Ghemawat, OSDI 2004: input splits (§3.1), user map() projection/filter
(§2), distributed grep / word count / inverted index / count-of-access
examples (§2.3), hash partitioning ``hash(k) mod R`` (§3.1).

Scale notes (100 TB):
- Filters and projections are declarative → Catalyst pushes them into the
  Parquet scan (PushedFilters / ReadSchema asserted in tests/test_plans.py);
  a 2-column projection reads 2 columns, not 11.
- Every aggregation here gets map-side partial aggregation automatically
  (HashAggregate partial→final), the exact analogue of the MapReduce combiner
  (OSDI'04 §4.3) — no shuffle carries raw rows.
- ``word_count``/``inverted_index`` shuffle only (token, partial-count) pairs;
  vocabulary-sized, not corpus-sized, so they scale with distinct terms.
- No collect(), no driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exactmath import round_div, sql_round_div
from ..registry import register
from ..sources.io import load


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shared tokenizer: documents are single-space-separated lowercase words
    (FIXTURES.md); drop empty tokens so empty/edge strings can't diverge from
    the DuckDB oracle's string_split behavior."""
    return df.select(
        "*", F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")


# ---------------------------------------------------------------- §2.1 scans


@register(
    "scan_lineitem",
    oracle="select count(*) as n_rows from lineitem",
)
def scan_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan row count of the largest table (input-split surface)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "scan_project_prune",
    oracle="select l_orderkey, l_quantity from lineitem",
)
def scan_project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan reading only 2 of 11 columns — column pruning must reach parquet."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


# --------------------------------------------- §2.2 projection / filter / map


@register(
    "map_project",
    oracle="""
    select l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) as revenue
    from lineitem
    """,
)
def map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row computed column = user map() emitting a derived value.

    No rounding: both engines evaluate the identical IEEE-754 expression on
    identical doubles, so results are bit-equal (SURVEY.md §7.3.1 applies to
    aggregates, not per-row math).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "filter_grep",
    oracle="""
    select doc_id, lang, source
    from documents
    where text like '%scan%'
    """,
)
def filter_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep (OSDI'04 §2.3): emit matching records."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.col("text").contains("scan")).select("doc_id", "lang", "source")


@register(
    "filter_predicate",
    oracle=f"""
    select count(*) as n_rows,
           {sql_round_div(
               "sum(cast(round(l_extendedprice * 100) as bigint)"
               " * cast(round(l_discount * 100) as bigint))",
               '10000', 2)} as revenue
    from lineitem
    where l_shipdate >= timestamp '1996-01-01'
      and l_shipdate < timestamp '1997-01-01'
      and l_discount between 0.05 and 0.07
      and l_quantity < 24
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range predicate (TPC-H Q6 shape), pushed down to the scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            # price*discount summed as exact 1e-4-dollar integers (the
            # 4-dp sum's 2-dp round has reachable .xx5 ties); plain-long
            # sum stays on the codegen fast path and ANSI raises loudly
            # far before any real corpus overflows the filtered subtotal
            round_div(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * F.round(F.col("l_discount") * 100).cast("long")
                ),
                F.lit(10000),
                2,
            ).alias("revenue"),
        )
    )


# ------------------------------------------ §2.3 canonical MapReduce jobs


@register(
    "word_count",
    oracle="""
    select word, count(*) as cnt
    from (select unnest(string_split(text, ' ')) as word from documents)
    where word <> ''
    group by word
    """,
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical MapReduce job (OSDI'04 §1.1 listing) over documents.text."""
    docs = load(spark, sf_dir, "documents")
    return tokens(docs).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "inverted_index",
    oracle="""
    select word,
           array_to_string(list_sort(list(distinct doc_id)), ',') as doc_ids,
           count(distinct doc_id) as n_docs
    from (select doc_id, unnest(string_split(text, ' ')) as word from documents)
    where word <> ''
    group by word
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term -> sorted posting list of doc_ids (OSDI'04 §2.3).

    The posting list is emitted as a comma-joined string rather than an
    array column: the oracle harness canonicalizes results via pandas
    sort_values, which cannot hash list cells, and a string keeps the
    order-insensitive value-hash check intact.
    """
    docs = load(spark, sf_dir, "documents")
    # r16 optimization round (guide §2.3 "aggregate before you shuffle"):
    # the old single groupBy mixed a distinct aggregate (countDistinct)
    # with collect_set, which Catalyst plans through Expand — every token
    # occurrence row duplicated into the shuffle. Deduplicating (word,
    # doc_id) FIRST (partial-aggregated distinct) lets the posting rollup
    # be a plain collect_list + count over already-unique pairs: two
    # slim exchanges instead of one doubled one. Interleaved A/B at
    # sf0.1: 1.04 -> 0.44 s, rows identical.
    pairs = tokens(docs).select("word", "doc_id").distinct()
    return pairs.groupBy("word").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias(
            "doc_ids"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "flatmap_explode",
    oracle="""
    select doc_id, cast(z[2] as bigint) - 1 as pos, cast(z[1] as varchar) as word
    from (
      select doc_id,
             unnest(list_zip(string_split(text, ' '),
                             generate_series(1, len(string_split(text, ' '))))) as z
      from documents)
    where cast(z[1] as varchar) <> ''
    """,
)
def flatmap_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N record expansion with per-doc token positions (map emitting many pairs)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")
    )


@register(
    "distinct_users",
    oracle="select distinct user_id from events",
)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-key identity reduce."""
    return load(spark, sf_dir, "events").select("user_id").distinct()


@register(
    "count_by_key",
    oracle="select event_type, count(*) as cnt from events group by event_type",
)
def count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-access-count shape (OSDI'04 §2.3): count per key."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "reduce_numeric",
    oracle="""
    select cast(sum(cast(round(l_extendedprice * 100) as hugeint)) as double)
             / 100 as sum_price,
           min(l_extendedprice) as min_price,
           max(l_extendedprice) as max_price,
           {avg_price} as avg_price,
           count(*) as n_rows
    from lineitem
    """.format(
        avg_price=sql_round_div(
            "sum(cast(round(l_extendedprice * 100) as hugeint))",
            "100 * count(*)",
            2,
        )
    ),
)
def reduce_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global single-key reduce: sum/min/max/avg/count.

    Sum and avg run on integer CENTS (prices are 2-dp by construction,
    so the *100 round only corrects fp repr), summed as plain LONG —
    exact, order-independent, and genuinely on the long codegen fast
    path (r16, ADVICE r15: the prior decimal(38,0)-sum formulation
    contradicted this claim — agg_pricing_summary measures that plan
    2-4x slower). Long suffices here for the same reason the flagship's
    sum_pc needs no split_units: even at 100 TB (~6e11 rows x ~4e6 cents)
    the GLOBAL cents total is ~2e18 < 2^63, and ANSI mode raises loudly,
    never wraps, if a corpus exceeds that. The sum needs no rounding (an
    exact 2-dp rational has no tie points); the avg is the all-integer
    half-up over (cents, 100·n) — a double-path round diverges between
    engines at rational tie points. min/max are exact doubles, left
    unrounded.
    """
    li = load(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.agg(
        (F.sum(pc).cast("double") / 100).alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        round_div(
            F.sum(pc),
            F.lit(100) * F.count(F.lit(1)),
            2,
        ).alias("avg_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "partition_by_key",
    oracle="""
    select cast(user_id % 8 as bigint) as part_id, count(*) as cnt
    from events
    group by part_id
    """,
)
def partition_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observable hash(k) mod R partitioning (OSDI'04 §3.1).

    Uses arithmetic pmod, not Spark's murmur3 ``hash()``, so DuckDB can
    reproduce the bucket ids (SURVEY.md §7.3.6). user_id >= 0 so pmod == %.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.pmod(F.col("user_id"), F.lit(8)).cast("bigint").alias("part_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
