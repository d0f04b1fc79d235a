"""Column-expression libraries (pure Catalyst, no Python UDFs)."""

from executor_u1mindexer_spark.functions import text, vector  # noqa: F401
