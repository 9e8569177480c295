"""Operator-totality sweeps: every registered query must behave sanely on
degenerate corpora — either produce a well-defined (possibly empty/NULL)
result or raise the documented loud guard. The r13 second pass found eight
silent-crash bugs this way (ANSI divide-by-zero in agg_hll_union /
pipeline_dataset_card / graph_clustering_coeff / eval_auc /
eval_cohens_kappa / eval_spearman_corr / eval_regression_metrics, a raw
ZeroDivisionError in graph_pagerank, float(None) in the logreg trainer);
these sweeps keep the class extinct. Degenerate inputs are exactly what a
100 TB pipeline's per-partition / per-day slices produce at the edges
(empty partitions, quiet days, cold-start tables, single-class labels).
"""

from __future__ import annotations

import os

import pytest

from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.sources.io import TABLES, load

from conftest import SF_SMOKE

#: Queries whose documented contract is a LOUD guard on insufficient data
#: (model training / codebook seeding needs a minimum corpus). Each must
#: raise ValueError with an actionable message — not crash in the JVM.
_DOCUMENTED_RAISERS = {
    "embed_kmeans",
    "embed_silhouette",        # shares the kmeans trainer
    "pipeline_quality_logreg", # gradient of an empty corpus
    "sim_pq_recall",           # PQ codebook seeding needs dense vec_ids
    "sim_ivfpq_recall",
}

#: On a 1-ROW corpus the logreg trainer has a gradient (it converges on
#: one example), so only the corpus-minimum guards still raise.
_ONE_ROW_RAISERS = _DOCUMENTED_RAISERS - {"pipeline_quality_logreg"}


def _degenerate_dir(spark, tmp_path_factory, n_rows: int) -> str:
    out = str(tmp_path_factory.mktemp(f"fixture_{n_rows}_rows"))
    for t in TABLES:
        load(spark, SF_SMOKE, t).limit(n_rows).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    return _degenerate_dir(spark, tmp_path_factory, 0)


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    return _degenerate_dir(spark, tmp_path_factory, 1)


def _sweep(spark, sf_dir, raisers, may_raise=frozenset()):
    """``raisers`` MUST raise ValueError on this corpus (a stale entry
    fails); ``may_raise`` are ALLOWED to (their minimum-corpus guard
    depends on which table the fixture degrades, so the requirement is
    only that any raise is the documented loud ValueError)."""
    failures = []
    for name in sorted(QUERIES):
        try:
            rows = QUERIES[name](spark, sf_dir).collect()
        except ValueError as ex:
            if name in raisers or name in may_raise:
                continue
            failures.append(f"{name}: undocumented ValueError: {ex}")
        except Exception as ex:  # noqa: BLE001 - the sweep reports, not hides
            failures.append(
                f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
            )
        else:
            if name in raisers:
                failures.append(
                    f"{name}: whitelisted as a raiser but returned "
                    f"{len(rows)} rows - remove the stale whitelist entry"
                )
    assert not failures, "\n".join(failures)


def test_every_query_is_total_on_empty_corpus(spark, empty_sf_dir):
    _sweep(spark, empty_sf_dir, _DOCUMENTED_RAISERS)


def test_every_query_is_total_on_one_row_corpus(spark, one_row_sf_dir):
    """A single row exercises the OTHER degeneracy class: single-class
    labels (AUC/kappa), zero variance (Spearman, R2), singleton windows —
    all must produce defined results (NULL where the statistic is
    undefined), not ANSI divide-by-zero crashes."""
    _sweep(spark, one_row_sf_dir, _ONE_ROW_RAISERS)


def test_documented_raisers_raise_actionably(spark, empty_sf_dir):
    """The loud guards must be ValueError with a non-empty message."""
    for name in sorted(_DOCUMENTED_RAISERS):
        with pytest.raises(ValueError) as exc:
            QUERIES[name](spark, empty_sf_dir).collect()
        assert str(exc.value), name


# ---------------------------------------------------------------------------
# ADVICE r13 regressions: crafted corpora that hit the degenerate slices the
# empty/1-row sweeps cannot reach (zero-variance pair sets, n=2 series,
# edgeless graphs) — and compare against the DuckDB oracle, not just
# crash-check, because two of the r13 findings were oracle DIVERGENCES.
# ---------------------------------------------------------------------------


def _events_fixture_dir(spark, tmp_path_factory, label, rows):
    """A full fixture dir whose events table is the crafted (event_id, ts,
    user_id, event_type, value, props) rows; every other table copies the
    smoke fixture. Written as SINGLE parquet files (pyarrow, not Spark's
    part-file directories) so duck_connection's read_parquet paths
    resolve."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp(f"advice_{label}"))
    for t in TABLES:
        if t == "events":
            continue
        pq.write_table(
            pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet")),
            os.path.join(out, f"{t}.parquet"),
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "event_id", "ts", "user_id", "event_type", "value", "props",
        ],
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(out, "events.parquet"),
    )
    return out


def _parity_or_fail(spark, sf_dir, names):
    from distributed_system_mapreduce_spark.testing import (
        duck_connection,
        run_parity,
    )

    con = duck_connection(sf_dir)
    try:
        problems = []
        for name in names:
            problems.extend(run_parity(name, spark, con, sf_dir))
        assert not problems, "\n".join(problems)
    finally:
        con.close()


def test_acf_zero_variance_is_null_and_matches_oracle(
    spark, tmp_path_factory
):
    """ADVICE r13: a constant hourly rate gives every lag's Pearson
    denominator exactly 0.0 — ANSI double 0/0 raised on Spark while the
    DuckDB oracle yielded NULL. One event per hour for 30 hours: all four
    lags (incl. the 6-pair lag-24 set) must come back NULL on BOTH
    engines."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (h, base + dt.timedelta(hours=h), h % 5, "alpha", 1.0, "{}")
        for h in range(30)
    ]
    d = _events_fixture_dir(spark, tmp_path_factory, "acf_const", rows)
    _parity_or_fail(spark, d, ["events_acf"])


def test_holt_two_hour_type_rmse_null_matches_oracle(
    spark, tmp_path_factory
):
    """ADVICE r13: a type with EXACTLY two observed hours passes the
    size >= 2 gate with zero smoothing steps, so sse = 0 and n - 2 = 0 —
    sqrt(0/0) raised on Spark while DuckDB emitted the row with NULL
    rmse. 'beta' has 2 hours (NULL rmse), 'gamma' has 10 varied hours
    (real rmse) so the non-degenerate path is exercised alongside."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "beta", 1.0, "{}"),
        (2, base + dt.timedelta(hours=1), 2, "beta", 1.0, "{}"),
    ]
    eid = 10
    for h in range(10):
        for _ in range(h % 3 + 1):
            rows.append(
                (eid, base + dt.timedelta(hours=h), eid % 7, "gamma",
                 2.0, "{}")
            )
            eid += 1
    d = _events_fixture_dir(spark, tmp_path_factory, "holt_n2", rows)
    _parity_or_fail(spark, d, ["events_holt_forecast", "events_acf"])


def test_clustering_coeff_edgeless_matches_oracle(
    spark, tmp_path_factory
):
    """ADVICE r13: on an edgeless co-purchase graph Spark's sum("t") over
    the empty per-vertex frame was NULL while the oracle's scalar
    count(*) said 0 triangles. A 1-row lineitem gives exactly that graph;
    the full oracle compare (not just the crash sweep) pins the
    coalesce."""
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("advice_edgeless"))
    for t in TABLES:
        tab = pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 1), os.path.join(out, f"{t}.parquet"))
    _parity_or_fail(spark, out, ["graph_clustering_coeff"])


def test_weighted_reservoir_zero_length_doc_matches_oracle(
    spark, tmp_path_factory
):
    """r14 totality audit: a zero-length document has Efraimidis-Spirakis
    weight 0, and the unguarded ln(u)/n_chars crashed under ANSI double
    division by zero (the same class ADVICE r13 found in events_acf /
    holt). Empty docs now key to NULL (inclusion probability 0, sorted
    last) on BOTH engines; the crafted corpus has one empty doc and three
    real ones so the sampler still ranks the weighted set."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("advice_res0"))
    for t in TABLES:
        if t == "documents":
            continue
        pq.write_table(
            pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet")),
            os.path.join(out, f"{t}.parquet"),
        )
    rows = [
        (1, "alpha beta gamma", "en", "web", 16),
        (2, "", "en", "web", 0),
        (3, "delta epsilon", "en", "web", 13),
        (4, "zeta eta theta iota", "en", "books", 19),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(out, "documents.parquet"),
    )
    _parity_or_fail(spark, out, ["sample_weighted_reservoir"])


def test_temperature_mix_all_empty_corpus_matches_oracle(
    spark, tmp_path_factory
):
    """r14 totality audit: an all-empty-text corpus gives total tokens
    n = 0, and the unguarded tokens/n crashed under ANSI divide-by-zero
    (zero-token languages also made boost = 0/0). Zero-token languages
    are now excluded on BOTH engines (a token mixture cannot sample
    them); 'de' has real tokens so the surviving arm is exercised."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("advice_mix0"))
    for t in TABLES:
        if t == "documents":
            continue
        pq.write_table(
            pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet")),
            os.path.join(out, f"{t}.parquet"),
        )
    rows = [
        (1, "", "en", "web", 0),
        (2, "", "en", "web", 0),
        (3, "wort zwei drei", "de", "web", 14),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(out, "documents.parquet"),
    )
    _parity_or_fail(spark, out, ["sample_temperature_mix"])


@pytest.fixture(scope="module")
def empty_text_sf_dir(spark, tmp_path_factory):
    """Smoke fixture with the documents table replaced by all-EMPTY-TEXT
    rows (n_chars = 0): the zero-token slice a 100 TB corpus's worst
    shards actually contain. Found sample_temperature_mix's tokens/0 and
    sample_weighted_reservoir's ln(u)/0 in r14 — the empty/1-row sweeps
    cannot reach either (their single doc has text)."""
    out = str(tmp_path_factory.mktemp("fixture_empty_text"))
    for t in TABLES:
        if t == "documents":
            continue
        load(spark, SF_SMOKE, t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    rows = [
        (i, "", "en" if i % 2 else "de", "web" if i % 3 else "books", 0)
        for i in range(1, 7)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def test_every_query_is_total_on_empty_text_corpus(
    spark, empty_text_sf_dir
):
    """Embeddings are REAL in this fixture, so the vector-family raisers
    run normally; only document-corpus guards may fire (may_raise — the
    sweep still rejects any NON-ValueError crash, which is how it caught
    the temperature-mix and reservoir ANSI divides)."""
    _sweep(
        spark,
        empty_text_sf_dir,
        frozenset(),
        may_raise=_DOCUMENTED_RAISERS,
    )
