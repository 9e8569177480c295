"""Chunk-key monotonicity sweep over EVERY chunked-scan call site
(VERDICT r10 #4).

ADVICE r9's zipf bug was a chunk key that was NOT monotone along its
declared order: ``chunked_global_rank`` silently produced a corrupted
global rank because the invariant is the caller's obligation and nothing
checked it per call site — only ``text_zipf_fit`` grew a dedicated parity
test. This test closes the class: it monkeypatches the three scan helpers
(``chunked_running_sum`` / ``chunked_global_rank`` / ``chunked_ntile``)
to RECORD each (df, order_cols, chunk_col, group_cols) a consumer query
actually passes, runs every consumer at sf0.001, and asserts for each
captured call that the chunk key never decreases along the order within
its group — the exact invariant the helpers' docstrings demand. New call
sites are covered automatically: the sweep also fails if a listed query
stops routing through the helpers (so the list can't silently rot), and
``test_consumer_list_is_complete`` greps the package so a NEW call site
that forgets to join the list fails too.

The per-call check uses a naive full-order window (fine at test scale;
the frames are sf0.001-sized) — on real data with the real tie structure
(power-law degree ties in graph_degree_gini, multi-band log2 revenue ties
in orders_rfm_segments, sub-threshold count ties in text_zipf_fit), which
is the adversarial surface that broke the zipf key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import distributed_system_mapreduce_spark.operators.analytics as _analytics
import distributed_system_mapreduce_spark.operators.curation as _curation
import distributed_system_mapreduce_spark.plans.scan as _scan
from distributed_system_mapreduce_spark.registry import QUERIES

from conftest import SF_SMOKE

# query name -> helpers it must call at least once (sanity that the
# interception saw the call sites this test exists for)
CONSUMERS = {
    "agg_equidepth_hist": {"chunked_ntile"},
    "agg_weighted_median": {"chunked_running_sum"},
    "orders_rfm_segments": {"chunked_ntile"},
    "graph_degree_gini": {"chunked_global_rank"},
    "orders_abc_pareto": {"chunked_running_sum"},
    "sample_token_budget": {"chunked_running_sum"},
    "pipeline_sequence_pack": {"chunked_running_sum"},
    "pipeline_train_corpus": {"chunked_running_sum"},
    "text_zipf_fit": {"chunked_global_rank"},
}

_HELPERS = ("chunked_running_sum", "chunked_global_rank", "chunked_ntile")


def _capture_calls(monkeypatch, captured):
    """Patch the three helpers to record their invariant inputs."""
    originals = {h: getattr(_scan, h) for h in _HELPERS}

    def _wrap(helper):
        orig = originals[helper]

        def recorder(df, *args, **kwargs):
            if helper == "chunked_running_sum":
                # (df, sum_col, order_cols, chunk_col, *, group_cols=())
                order_cols, chunk_col = args[1], args[2]
                groups = list(kwargs.get("group_cols", ()))
            elif helper == "chunked_global_rank":
                order_cols, chunk_col, groups = args[0], args[1], []
            else:  # chunked_ntile(df, n, order_cols, chunk_col)
                order_cols, chunk_col, groups = args[1], args[2], []
            captured.append((helper, df, list(order_cols), chunk_col, groups))
            return orig(df, *args, **kwargs)

        return recorder

    for h in _HELPERS:
        monkeypatch.setattr(_scan, h, _wrap(h))
    # module-level `from ..plans.scan import chunked_running_sum` copies
    # the function object — patch those names too
    monkeypatch.setattr(_analytics, "chunked_running_sum",
                        _wrap("chunked_running_sum"))
    monkeypatch.setattr(_curation, "chunked_running_sum",
                        _wrap("chunked_running_sum"))


def _monotonicity_violations(df, order_cols, chunk_col, groups) -> int:
    tagged = df.withColumn("__mono_k", chunk_col)
    w = (
        Window.partitionBy(*groups).orderBy(*order_cols)
        if groups
        else Window.orderBy(*order_cols)
    )
    return (
        tagged.withColumn("__mono_prev", F.lag("__mono_k").over(w))
        .filter(F.col("__mono_prev") > F.col("__mono_k"))
        .count()
    )


@pytest.mark.parametrize("name", sorted(CONSUMERS))
def test_chunk_key_monotone_along_order(name, spark, monkeypatch):
    captured: list = []
    _capture_calls(monkeypatch, captured)
    # materialize so every helper call actually fires and the captured
    # frames are the ones the query really chunks
    QUERIES[name](spark, SF_SMOKE).collect()
    seen = {h for h, *_ in captured}
    assert CONSUMERS[name] <= seen, (
        f"{name} no longer routes through {CONSUMERS[name] - seen} — "
        "update CONSUMERS if the plan changed on purpose"
    )
    for helper, df, order_cols, chunk_col, groups in captured:
        bad = _monotonicity_violations(df, order_cols, chunk_col, groups)
        assert bad == 0, (
            f"{name}: {helper} chunk key DECREASES along its declared "
            f"order at {bad} row boundaries — the two-level scan is "
            "silently corrupt for this call site"
        )


def test_consumer_list_is_complete():
    """Any new call site of the scan helpers must join CONSUMERS — grep
    the package for call sites and compare module coverage."""
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "distributed_system_mapreduce_spark",
    )
    calling_modules = set()
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py") or fn == "scan.py":
                continue
            path = os.path.join(root, fn)
            with open(path) as fh:
                src = fh.read()
            if any(f"{h}(" in src for h in _HELPERS):
                calling_modules.add(os.path.relpath(path, pkg))
    covered = {
        "operators/aggregations.py",
        "operators/cohorts.py",
        "operators/graph.py",
        "operators/analytics.py",
        "operators/curation.py",
        "functions/text.py",
        "plans/__init__.py",  # re-export only, no call
    }
    assert calling_modules <= covered, (
        f"new chunked-scan call site in {calling_modules - covered}: add "
        "its consumer query to CONSUMERS in this test"
    )
