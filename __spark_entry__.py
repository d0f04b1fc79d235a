"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in ``executor_u1mindexer_spark/``; this module is a
thin aggregator over the suite registry (suites/__init__.py), where each
suite module pairs DataFrame builders with their DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact top-k cosine KNN with
    full-payload fetch (the reference's /search endpoint, executor.py:73-125,
    incl. the executor.py:116 full-Document join)."""
    from executor_u1mindexer_spark.suites import vector_suite

    return vector_suite.payload_fetch(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from executor_u1mindexer_spark import suites

    q, _ = suites.merged()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI SQL equivalent for each query (omitted → rows-only check)."""
    from executor_u1mindexer_spark import suites

    _, o = suites.merged()
    return o
