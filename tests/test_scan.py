"""plans.chunked_running_sum — the distributed prefix sum (round 8).

Guarantees: (1) row-identical to the naive group-sized running-sum window
for both integer and decimal payloads, including duplicate order keys
broken by the unique tiebreak; (2) the converted queries actually route
through the chunked scan (offsets join present, no group-global running
window left).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.plans import explain_str
from distributed_system_mapreduce_spark.plans.scan import chunked_running_sum
from distributed_system_mapreduce_spark.registry import QUERIES

from conftest import SF_DIR


def _fixture(spark):
    rows = [(i % 3, i, (i * 7) % 5 + 1) for i in range(900)]
    return spark.createDataFrame(rows, "grp int, id bigint, v bigint")


def test_chunked_scan_matches_naive_window_grouped(spark):
    df = _fixture(spark)
    order = [F.asc("id")]
    # chunk on id ranges: monotone along the order
    got = chunked_running_sum(
        df, "v", order, F.floor(F.col("id") / 100).cast("int"),
        group_cols=("grp",), out_col="cum",
    )
    w = Window.partitionBy("grp").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_chunked_scan_matches_naive_global_desc_with_ties(spark):
    # global scan, descending order with heavy ties, decimal payload
    rows = [(i, (i * 3) % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, score int").select(
        "id", "score", F.col("score").cast("decimal(10,2)").alias("v")
    )
    order = [F.desc("score"), F.asc("id")]
    got = chunked_running_sum(
        df, "v", order, -F.col("score").cast("int"), out_col="cum"
    )
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    g = {r.id: r.cum for r in got.collect()}
    e = {r.id: r.cum for r in want.collect()}
    assert g == e


def test_chunk_boundary_rows_keep_exact_cum(spark):
    # single-row chunks: every row is a boundary; offsets must chain exactly
    df = spark.createDataFrame(
        [(i, 10 ** (i % 3)) for i in range(12)], "id bigint, v bigint"
    )
    got = chunked_running_sum(
        df, "v", [F.asc("id")], F.col("id").cast("int"), out_col="cum"
    ).collect()
    running, expect = 0, {}
    for i in range(12):
        running += 10 ** (i % 3)
        expect[i] = running
    assert {r.id: r.cum for r in got} == expect


@pytest.mark.parametrize(
    "name",
    ["sample_token_budget", "orders_abc_pareto", "pipeline_sequence_pack"],
)
def test_converted_scans_have_no_global_running_window(name, spark):
    plan = explain_str(QUERIES[name](spark, SF_DIR), mode="formatted")
    assert "__scan_chunk" in plan, f"{name} lost its chunked scan"


# ---------------------------------------------------------------------------
# chunked_global_rank / chunked_ntile (round 9, VERDICT r8 #2): the
# rank/ntile siblings of the prefix sum. Same guarantees: row-identical to
# the naive unpartitioned window, including tie-heavy orders and the
# ceil-first ntile bucket-size rule, and the converted queries route
# through the chunked form.
# ---------------------------------------------------------------------------

from distributed_system_mapreduce_spark.plans.scan import (  # noqa: E402
    chunked_global_rank,
    chunked_ntile,
)


def test_chunked_rank_matches_naive_global_window(spark):
    rows = [((i * 37) % 250, i) for i in range(700)]
    df = spark.createDataFrame(rows, "score int, id bigint")
    order = [F.asc("score"), F.asc("id")]
    got = chunked_global_rank(
        df, order, F.floor(F.col("score") / 25).cast("int"), out_col="r"
    )
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert {r.id: r.r for r in got.collect()} == {
        r.id: r.r for r in want.collect()
    }


@pytest.mark.parametrize("n,rows", [(4, 700), (10, 700), (7, 3)])
def test_chunked_ntile_matches_naive_ntile(spark, n, rows):
    # heavy ties on the leading key; n=7 over 3 rows exercises the
    # c < n branch (every row its own bucket, remainder rule)
    data = [((i * 3) % 11, i) for i in range(rows)]
    df = spark.createDataFrame(data, "score int, id bigint")
    order = [F.desc("score"), F.asc("id")]
    chunk = F.struct(
        (-F.col("score")).alias("ns"),
        F.floor(F.col("id") / 64).alias("blk"),
    )
    got = chunked_ntile(df, n, order, chunk, out_col="b")
    want = df.withColumn("b", F.ntile(n).over(Window.orderBy(*order)))
    assert {r.id: r.b for r in got.collect()} == {
        r.id: r.b for r in want.collect()
    }


@pytest.mark.parametrize("name", ["agg_equidepth_hist", "orders_rfm_segments"])
def test_converted_ntiles_have_no_global_sort_window(name, spark):
    plan = explain_str(QUERIES[name](spark, SF_DIR), mode="formatted")
    assert "__scan_chunk" in plan, f"{name} lost its chunked ntile"
    assert "ntile(" not in plan, f"{name} still plans a naive ntile window"


# ---------------------------------------------------------------------------
# Property check (hypothesis): chunked_ntile must equal the naive global
# ntile for ARBITRARY tie structures, bucket counts, and chunk granularity —
# the deterministic cases above pin known branches (c < n, ceil-first
# remainder); this sweeps the space between them. Examples are capped and
# frames kept tiny: each case is two small local jobs.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=13),
    rows=st.integers(min_value=1, max_value=120),
    tie_mod=st.integers(min_value=1, max_value=9),
    chunk_div=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_chunked_ntile_property(spark, n, rows, tie_mod, chunk_div, seed):
    data = [(((i * 131 + seed) % 1009) % tie_mod, i) for i in range(rows)]
    df = spark.createDataFrame(data, "score int, id bigint")
    order = [F.asc("score"), F.asc("id")]
    chunk = F.struct(
        F.col("score").alias("s"),
        F.floor(F.col("id") / chunk_div).alias("blk"),
    )
    got = chunked_ntile(df, n, order, chunk, out_col="b")
    want = df.withColumn("b", F.ntile(n).over(Window.orderBy(*order)))
    assert {r.id: r.b for r in got.collect()} == {
        r.id: r.b for r in want.collect()
    }


# ---------------------------------------------------------------------------
# ADVICE r9 regressions: (1) text_zipf_fit's chunk key must be monotone for
# vocabularies with MANY distinct sub-threshold counts spread across first
# letters — the prior banded key collapsed all c < T into one band and let
# the letter sub-key reorder across counts (a c=200 'z' word ranked after a
# c=100 'a' word); (2) chunked_ntile's bucket math must be true integer
# division — double division + cast-truncation can misassign near 2**53.
# ---------------------------------------------------------------------------

from distributed_system_mapreduce_spark.functions.text import (  # noqa: E402
    ZIPF_CHUNK_T,
    zipf_chunk_key,
)
from distributed_system_mapreduce_spark.plans.scan import _exact_div  # noqa: E402


def test_zipf_chunk_key_matches_naive_rank(spark):
    # counts 1..ZIPF_CHUNK_T+40 interleaved across first letters a..j so
    # sub-threshold counts and letters anti-correlate: high counts get
    # late letters, the shape that breaks a (band, letter)-keyed chunking.
    rows = []
    for i in range(ZIPF_CHUNK_T + 40):
        c = ZIPF_CHUNK_T + 40 - i
        letter = chr(ord("a") + (i % 10))
        rows.append((f"{letter}word{i:04d}", c))
        rows.append((f"{letter}tie{i:04d}", c))  # ties within one count
    df = spark.createDataFrame(rows, "word string, c bigint")
    order = [F.desc("c"), F.asc("word")]
    got = chunked_global_rank(
        df, order, zipf_chunk_key(F.col("c"), F.col("word")), out_col="r"
    )
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert {r.word: r.r for r in got.collect()} == {
        r.word: r.r for r in want.collect()
    }


def test_exact_div_no_fp_rounding_near_2_53(spark):
    # quotients whose double-division lands on the wrong side of the
    # truncation boundary: a = k*b + (b-1) with k near 2**53/b
    cases = []
    for b in (3, 7, 1_000_003, 2**31 - 1):
        for k in (2**53 // b, 2**53 // b - 1, (2**62 - 1) // b):
            a = k * b + (b - 1)
            if a < 2**63:
                cases.append((a, b, k))
    df = spark.createDataFrame(cases, "a bigint, b bigint, want bigint")
    got = df.select("a", "b", "want", _exact_div(F.col("a"), F.col("b")).alias("got"))
    bad = got.filter(F.col("got") != F.col("want")).collect()
    assert not bad, bad


def test_exact_div_independent_of_decimal_precision_loss_conf(spark):
    # ADVICE r10: the decimal(38,0)-division version of _exact_div was only
    # exact under spark.sql.decimal.operations.allowPrecisionLoss=true; the
    # long-native `div` rewrite must give the true quotient (not null, not
    # rounded) under BOTH settings.
    conf_key = "spark.sql.decimal.operations.allowPrecisionLoss"
    before = spark.conf.get(conf_key, "true")
    cases = [(2**62 - 1, 3), (2**53 + 1, 7), (9, 10), (0, 5)]
    df = spark.createDataFrame(cases, "a bigint, b bigint")
    want = {(a, b): a // b for a, b in cases}
    try:
        for setting in ("false", "true"):
            spark.conf.set(conf_key, setting)
            got = df.select(
                "a", "b", _exact_div(F.col("a"), F.col("b")).alias("q")
            ).collect()
            assert {(r.a, r.b): r.q for r in got} == want, setting
    finally:
        spark.conf.set(conf_key, before)
