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


def _sweep(spark, sf_dir, raisers):
    failures = []
    for name in sorted(QUERIES):
        try:
            rows = QUERIES[name](spark, sf_dir).collect()
        except ValueError as ex:
            if name in raisers:
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
