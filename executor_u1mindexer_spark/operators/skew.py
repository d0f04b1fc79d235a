"""Skew mitigation — salted joins for hot keys.

At 100 TB a handful of hot join keys (one celebrity user, one default
product id) can pin a single reducer. AQE's skew-join splitting
(spark.sql.adaptive.skewJoin, on in session.py) handles most cases at
runtime; this operator is the explicit fallback for when the skewed side
must be pre-split deterministically (e.g. a stable production job where
plan shape must not depend on runtime stats):

- big side: salt = a deterministic value in [0, n_salt) derived from an
  existing column (NOT rand() — results must be reproducible);
- small side: replicated n_salt times (explode of a literal sequence);
- join on (key, salt): each hot key now spreads over n_salt reducers.

Result set is provably identical to the unsalted join (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_source: Column,
    n_salt: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on `key`, with the big side salted by `salt_source`
    (any deterministic expression over big's columns, e.g. a line number).
    The small side is replicated n_salt x — keep it broadcast-sized or
    accept the replication cost for the skew relief."""
    b = big.withColumn("__salt", F.pmod(salt_source.cast("long"), F.lit(n_salt)))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    out = b.join(s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
