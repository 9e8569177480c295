"""Physical-plan assertion helpers (SURVEY.md §5.2.4).

The reference model has no optimizer (the user's map function IS the pushed
predicate); our engine leans on Catalyst for pushdown/pruning/broadcast, so
these helpers let tests pin the physical properties that matter at 100 TB:
filters reaching the parquet scan, column pruning, broadcast joins for small
dims, partial aggregation, top-k short-circuits, whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    missing = [f for f in fragments if f not in plan]
    assert not missing, f"plan missing {missing}\n--- plan ---\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    present = [f for f in fragments if f in plan]
    assert not present, f"plan unexpectedly contains {present}\n--- plan ---\n{plan}"
    return plan
