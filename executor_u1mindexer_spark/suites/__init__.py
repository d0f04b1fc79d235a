"""Query suites — the driver-facing registry.

Each suite module exposes:
  QUERIES: dict[name, Callable[[SparkSession, sf_dir], DataFrame]]
  ORACLES: dict[name, str]   # DuckDB ANSI SQL over the fixture views

`__spark_entry__.py` aggregates every suite. Names are the operator names
from SURVEY.md §2. A query without an oracle entry gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


SUITE_MODULES = (
    "vector_suite",
    "maintenance_suite",
    "relational_suite",
    "relational_extra_suite",
    "events_suite",
    "dedup_suite",
    "text_suite",
    "multimodal_suite",
    "similarity_suite",
    "sources_suite",
    "pipeline_suite",
    "composed_suite",
)


def merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    suites = []
    for mod_name in SUITE_MODULES:
        try:
            suites.append(
                importlib.import_module(f"executor_u1mindexer_spark.suites.{mod_name}")
            )
        except ModuleNotFoundError as e:
            # Only tolerate the suite module itself not existing yet;
            # a broken import inside a suite must fail loudly.
            if e.name != f"executor_u1mindexer_spark.suites.{mod_name}":
                raise
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for s in suites:
        for k in s.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query name {k!r}")
        queries.update(s.QUERIES)
        oracles.update(s.ORACLES)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles
