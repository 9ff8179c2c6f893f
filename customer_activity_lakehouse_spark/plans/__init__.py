"""Query catalog: every entry pairs a Spark DataFrame plan with a DuckDB
oracle SQL string computing the same result (same column names, same
rounding), per the driver contract in /root/repo/__spark_entry__.py.
"""

from .core import QUERIES as CORE_QUERIES
from .llm_ops import QUERIES as LLM_QUERIES
from .registry import Query
from .timeseries import QUERIES as TS_QUERIES

QUERIES: dict[str, Query] = {**CORE_QUERIES, **LLM_QUERIES, **TS_QUERIES}

__all__ = ["Query", "QUERIES"]
