"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the config below is chosen so the same
logical plans scale to a multi-executor cluster: AQE handles skew and
post-shuffle coalescing at any scale, shuffle partitions are sized for the
local fixture data but overridable via SPARK_GRAFT_SHUFFLE_PARTITIONS for
cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "executor-u1mindexer-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Scale notes (100 TB target):
    - AQE on: runtime coalescing of small post-shuffle partitions, skew-join
      splitting, and dynamic join-strategy demotion are essential when the
      same plan runs at 1000x the data.
    - auto broadcast threshold left at default (10 MB): dimension tables
      (region/nation/supplier at any SF, and the KNN query-vector set) stay
      broadcastable; fact-fact joins fall back to sort-merge.
    - Arrow enabled for the few mapInPandas paths (multimodal decode,
      optional partitioned-ANN build).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as int64 nanos and convert in tables.load (Spark
        # timestamps are microseconds — ns precision is truncated there).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
