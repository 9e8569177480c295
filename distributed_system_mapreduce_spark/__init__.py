"""PySpark-native analytics engine with the capabilities of the
``ZoeZXXie/Distributed-System-MapReduce`` reference (whose snapshot is empty —
SURVEY.md §0; parity targets the published MapReduce model, OSDI 2004, plus
the driver-mandated LLM-data-pipeline extensions).

Importing this package registers every query into ``registry.QUERIES`` /
``registry.ORACLES``.
"""

from . import registry  # noqa: F401
from .functions import (  # noqa: F401
    jsonops,
    text,
    vectors,
)
from .operators import (  # noqa: F401
    aggregations,
    dedup,
    extended,
    joins,
    relational,
    setops,
    sorts,
    timewin,
    windows,
)

__all__ = ["registry"]
