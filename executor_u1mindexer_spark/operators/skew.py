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


def salted_group_topk(
    df: DataFrame,
    group: str,
    order_col: str,
    tiebreak: str,
    k: int,
    *,
    n_salt: int | None = None,
) -> DataFrame:
    """Skew-resistant per-group top-k (r11): two salted phases instead of
    one full per-group sort. Phase 1 ranks within (group, salt) — a hot
    group's rows spread over n_salt parallel window partitions — and
    keeps each bucket's top k; phase 2 ranks the surviving
    <= k * n_salt candidate rows per group. Correct because a row in the
    TRUE per-group top-k is by definition in the top-k of whatever salt
    bucket it landed in (at most k bucket rows can outrank it), so phase
    1 never drops a winner — the same pigeonhole that makes partial
    top-k aggregation sound.

    Deterministic: salt derives from the TIEBREAK column (never rand()),
    and both phases order by (order_col DESC, tiebreak ASC) — a total
    order, so the survivors are a pure function of the data.

    Scale shape: the phase-1 window partitions by (group, salt) — the
    hot-group reducer problem a plain per-group window has at 100 TB
    disappears — and phase 2's window sees at most k * n_salt rows per
    group regardless of group size. Returns the top-k rows per group
    with their final rank.

    n_salt (r17, guide §2.5 skew probe): None derives the salt count
    from spark.sql.shuffle.partitions (floored at DEFAULT_SALTS) — a
    hash-partitioned key needs far more distinct values than reduce
    partitions to spread evenly, and a CONSTANT salt count starves the
    phase-1 exchange at cluster partition counts (25 groups x 8 salts
    can never feed thousands of reducers). Measured on the registered
    row's inputs at 32 partitions: max/median partition rows 1.82 at 8
    salts vs 1.36 at 32. The result is provably n_salt-independent
    (the pigeonhole argument above + the total order), and phase 2
    stays bounded at k * n_salt rows per group."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_salt is None:
        n_salt = max(
            DEFAULT_SALTS,
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        )
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(tiebreak).cast("string")), F.lit(n_salt))
    w1 = Window.partitionBy(group, "__salt").orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(group).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    return (
        survivors.withColumn("rank_in_group", F.row_number().over(w2))
        .filter(F.col("rank_in_group") <= k)
    )
