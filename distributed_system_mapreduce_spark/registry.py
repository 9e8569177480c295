"""Central query/oracle registry.

Every operator the engine supports registers itself here with a name from
SURVEY.md §2 and (where SQL-expressible) a matching DuckDB oracle SQL string.
The driver contract (/root/repo/__spark_entry__.py) exposes these via
``queries()`` / ``oracle_sql()``.

Reference-parity note: the reference snapshot at /root/reference/ is an EMPTY
directory (verified; SURVEY.md §0), so no ``file:line`` citations into it are
possible. Parity targets are the published MapReduce model (Dean & Ghemawat,
"MapReduce: Simplified Data Processing on Large Clusters", OSDI 2004) plus the
driver-mandated LLM-pipeline extensions (SURVEY.md §2.8).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark, sf_dir) -> DataFrame
QUERIES: dict[str, QueryFn] = {}
#: name -> ANSI SQL runnable by DuckDB on pre-registered views
#: (region nation customer supplier part orders lineitem events documents
#:  embeddings). Queries absent here are "rows-only" checked by the driver.
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``, optionally with its DuckDB oracle.

    Column names of the Spark result and the oracle SQL must match exactly:
    the driver sorts columns by name before hashing values, so every computed
    column is aliased identically on both sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        fn.__query_name__ = name  # type: ignore[attr-defined]
        return fn

    return deco
