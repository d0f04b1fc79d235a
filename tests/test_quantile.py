"""Equi-depth quantile sketch (operators/quantile.py): python-replay
parity of the state, rank-bound guarantees of estimates, mergeability."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import quantile as QT


def _bucket(vid: int, p: int) -> int:
    return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16) % p


def _py_state(pairs, p, s):
    """Sequential replay of the state contract: md5 bucket, (value, id)
    sort, standard ntile (first n%s tiles get the extra row), max/count."""
    buckets = {}
    for vid, v in pairs:
        buckets.setdefault(_bucket(vid, p), []).append((float(v), vid))
    out = {}
    for b, rows in buckets.items():
        rows.sort()
        n = len(rows)
        ntiles = min(s, n)
        q, r = divmod(n, ntiles)
        pos = 0
        for t in range(1, ntiles + 1):
            size = q + (1 if t <= r else 0)
            chunk = rows[pos : pos + size]
            pos += size
            if not chunk:
                continue
            out[(b, t)] = (max(c[0] for c in chunk), len(chunk))
    return out


def test_state_matches_python_replay(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    p, s = 4, 16
    got = {
        (r.bucket, r.tile): (r.rep_value, r.weight)
        for r in QT.quantile_state(
            orders, "o_totalprice", "o_orderkey", p, s
        ).collect()
    }
    pairs = [
        (r.o_orderkey, r.o_totalprice)
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    ]
    assert got == _py_state(pairs, p, s)


def test_estimate_rank_bounds_hold(spark, sf_dir):
    """The two guarantees the suite row checks, asserted directly: the
    estimate's exact <= -rank reaches the target, and its <-rank stays
    within target + max_tile + err_budget."""
    orders = tables.load(spark, sf_dir, "orders")
    st = QT.quantile_state(orders, "o_totalprice", "o_orderkey", 8, 32)
    est_rows = QT.quantile_estimate(st, [0.1, 0.5, 0.9]).collect()
    vals = sorted(
        r.o_totalprice for r in orders.select("o_totalprice").collect()
    )
    assert len(est_rows) == 3
    for r in est_rows:
        rank_le = sum(1 for v in vals if v <= r.est_value)
        rank_lt = sum(1 for v in vals if v < r.est_value)
        assert rank_le >= r.target
        assert rank_lt <= r.target + r.max_tile + r.err_budget
        assert r.n_total == len(vals)


def test_merge_of_halves_answers_whole_table_within_bounds(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = QT.quantile_merge(
        QT.quantile_state(even, "o_totalprice", "o_orderkey", 8, 32),
        QT.quantile_state(odd, "o_totalprice", "o_orderkey", 8, 32),
    )
    est = QT.quantile_estimate(
        merged, [0.5], bucket_cols=["src", "bucket"],
        order_cols=["src", "bucket", "tile"],
    ).collect()[0]
    vals = sorted(r.o_totalprice for r in orders.select("o_totalprice").collect())
    rank_le = sum(1 for v in vals if v <= est.est_value)
    rank_lt = sum(1 for v in vals if v < est.est_value)
    assert est.n_total == len(vals)  # merge saw every row exactly once
    assert rank_le >= est.target
    assert rank_lt <= est.target + est.max_tile + est.err_budget


def test_estimate_is_a_raw_data_value(spark, sf_dir):
    """No float arithmetic: the returned estimate must literally be one
    of the input values (bit-exactness across engines rests on this)."""
    orders = tables.load(spark, sf_dir, "orders")
    st = QT.quantile_state(orders, "o_totalprice", "o_orderkey", 8, 32)
    est = QT.quantile_estimate(st, [0.5]).collect()[0].est_value
    vals = {r.o_totalprice for r in orders.select("o_totalprice").collect()}
    assert est in vals


def test_params_validated(spark):
    df = None
    with pytest.raises(ValueError, match="buckets"):
        QT.quantile_state(df, "v", "id", 0, 16)
    with pytest.raises(ValueError, match="tiles"):
        QT.quantile_state(df, "v", "id", 4, 1)
    with pytest.raises(ValueError, match="quantile q"):
        QT.oracle_estimate_body_sql("state", [1.5])
    with pytest.raises(ValueError, match="at least one"):
        QT.quantile_merge()


def test_grouped_state_slices_equal_per_group_plain_state(spark, sf_dir):
    """Slicing the grouped state at one group must equal quantile_state
    run on that group's rows alone — grouped is a composition, not an
    approximation."""
    events = tables.load(spark, sf_dir, "events")
    grouped = QT.quantile_state_grouped(
        events, "value", "event_id", ["event_type"], 4, 16
    )
    etype = sorted(
        r.event_type for r in events.select("event_type").distinct().collect()
    )[0]
    got = {
        (r.bucket, r.tile): (r.rep_value, r.weight)
        for r in grouped.filter(F.col("event_type") == etype).collect()
    }
    want = {
        (r.bucket, r.tile): (r.rep_value, r.weight)
        for r in QT.quantile_state(
            events.filter(F.col("event_type") == etype), "value", "event_id", 4, 16
        ).collect()
    }
    assert got == want and len(want) > 0


def test_grouped_estimate_bounds_hold_per_group(spark, sf_dir):
    events = tables.load(spark, sf_dir, "events")
    st = QT.quantile_state_grouped(
        events, "value", "event_id", ["event_type"], 4, 16
    )
    ests = QT.quantile_estimate_grouped(st, [0.5], ["event_type"]).collect()
    by_type = {}
    for r in events.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    assert len(ests) == len(by_type)
    for r in ests:
        vals = by_type[r.event_type]
        rank_le = sum(1 for v in vals if v <= r.est_value)
        rank_lt = sum(1 for v in vals if v < r.est_value)
        assert r.n_total == len(vals)
        assert rank_le >= r.target
        assert rank_lt <= r.target + r.max_tile + r.err_budget


def test_grouped_requires_group_cols(spark):
    with pytest.raises(ValueError, match="group_cols"):
        QT.quantile_state_grouped(None, "v", "id", [])
    with pytest.raises(ValueError, match="group_cols"):
        QT.quantile_estimate_grouped(None, [0.5], [])


def test_state_replay_property(spark):
    """Hypothesis-style randomized replay: arbitrary (id, value) multisets
    with duplicates/negatives must produce exactly the python-replayed
    state for several (p, s) shapes."""
    import random

    rng = random.Random(9)
    for trial in range(4):
        n = rng.randrange(5, 300)
        pairs = [
            (rng.randrange(0, 10_000_000), rng.choice([-1.5, 0.0, 2.25, 7.0,
                                                       rng.random() * 100]))
            for _ in range(n)
        ]
        # unique ids required (id is the deterministic tiebreak)
        pairs = list({vid: v for vid, v in pairs}.items())
        df = spark.createDataFrame(pairs, "id long, v double")
        p, s = rng.choice([(1, 4), (4, 8), (8, 16)])
        got = {
            (r.bucket, r.tile): (r.rep_value, r.weight)
            for r in QT.quantile_state(df, "v", "id", p, s).collect()
        }
        assert got == _py_state(pairs, p, s), (trial, p, s)


def test_estimate_auto_includes_src_on_merged_state(spark, sf_dir):
    """ADVICE r06: defaults must detect a quantile_merge output — without
    'src' the cumulative ordering is tie-dependent and err_budget groups
    buckets across sources. Auto defaults == the explicit src columns."""
    orders = tables.load(spark, sf_dir, "orders")
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = QT.quantile_merge(
        QT.quantile_state(even, "o_totalprice", "o_orderkey", 4, 16),
        QT.quantile_state(odd, "o_totalprice", "o_orderkey", 4, 16),
    )
    auto = QT.quantile_estimate(merged, [0.25, 0.75]).collect()
    explicit = QT.quantile_estimate(
        merged, [0.25, 0.75], bucket_cols=["src", "bucket"],
        order_cols=["src", "bucket", "tile"],
    ).collect()
    key = lambda r: r.q  # noqa: E731
    assert sorted(auto, key=key) == sorted(explicit, key=key)
    # explicit lists that omit src on a merged state are rejected loudly
    with pytest.raises(ValueError, match="src"):
        QT.quantile_estimate(merged, [0.5], bucket_cols=["bucket"])
    with pytest.raises(ValueError, match="src"):
        QT.quantile_estimate(
            merged, [0.5], bucket_cols=["src", "bucket"],
            order_cols=["bucket", "tile"],
        )


def test_equidepth_octiles_hand_multiset(spark):
    """Known 13-value multiset (the cross-engine semantic fixture):
    boundaries 1.5, 5, 5, 9, 12, 40, 40.5 — ties go to the upper
    bucket, so e.g. both 5s' bucket counts land where >= puts them;
    totals cover every row exactly once."""
    from executor_u1mindexer_spark.operators import quantile as QT

    vals = [1, 1, 2, 5, 5, 5, 9, 12, 12, 40, 40, 41, 100]
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    rows = QT.equidepth_octiles(df, "value").collect()
    assert sum(r.n_rows for r in rows) == len(vals)
    got = {r.bucket: (r.n_rows, r.lo_value, r.hi_value) for r in rows}
    # replay: boundaries over the expanded multiset at i/8
    import numpy as np

    bounds = [np.quantile(vals, i / 8.0, method="linear") for i in range(1, 8)]
    want: dict = {}
    for v in vals:
        b = sum(v >= q for q in bounds)
        n, lo, hi = want.get(b, (0, v, v))
        want[b] = (n + 1, min(lo, v), max(hi, v))
    assert got == {b: (n, float(lo), float(hi)) for b, (n, lo, hi) in want.items()}


def test_equidepth_octiles_partition_invariant_and_balanced(spark):
    from executor_u1mindexer_spark.operators import quantile as QT

    rows = [(float((i * 37) % 500) / 7.0,) for i in range(4000)]
    a = QT.equidepth_octiles(
        spark.createDataFrame(rows, "value double").repartition(1), "value"
    ).collect()
    b = QT.equidepth_octiles(
        spark.createDataFrame(rows, "value double").repartition(13), "value"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    counts = [r.n_rows for r in a]
    assert sum(counts) == 4000
    # equal-frequency within tie-slack: every bucket within 25% of n/8
    assert all(abs(c - 500) <= 125 for c in counts)
