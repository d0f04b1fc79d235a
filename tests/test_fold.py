"""suites/_fold.py — the r10 parameterized-twin melt helpers.

The registry-level correctness of every folded row is covered by the
dtype-faithful sweeps (all variants' values reach the driver compare);
these tests pin the helper CONTRACTS: lane cross-checking between the
Spark and oracle sides, key padding, and the boolean/string/date lanes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from executor_u1mindexer_spark.suites import _fold as FD


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 2.5, True, None), (2, "b", -1.0, None, "2020-03-04")],
        "k bigint, s string, x double, b boolean, d string",
    ).withColumn("d", F.col("d").cast("date"))


def test_melt_spark_lanes_and_key_padding(spark):
    out = FD.melt_spark(
        _df(spark), "v1", ["k"], ["s", "x", "b", "d"],
        bools={"b"}, strings={"s"}, dates={"d"},
    )
    assert out.columns == list(FD.MELT_COLS)
    rows = {(r.metric, r.k1): r for r in out.collect()}
    assert len(rows) == 8 and all(r.variant == "v1" for r in rows.values())
    assert all(r.k2 is None for r in rows.values())  # padded second key
    assert rows[("s", "1")].val_s == "a" and rows[("s", "1")].val is None
    assert rows[("x", "2")].val == -1.0 and rows[("x", "2")].val_s is None
    assert rows[("b", "1")].val == 1.0
    assert rows[("b", "2")].val is None  # NULL boolean stays NULL
    assert rows[("d", "2")].val_s == "2020-03-04"
    assert rows[("d", "1")].val_s is None


def test_melt_spark_lane_mismatch_is_loud(spark):
    # a boolean column not declared in bools must fail construction so
    # the Spark and oracle sides can never silently disagree on a lane
    with pytest.raises(ValueError, match="lane mismatch"):
        FD.melt_spark(_df(spark), "v1", ["k"], ["b"])
    with pytest.raises(ValueError, match="lane mismatch"):
        FD.melt_spark(_df(spark), "v1", ["k"], ["x"], strings={"x"})
    with pytest.raises(ValueError, match="<= 2 keys"):
        FD.melt_spark(_df(spark), "v1", ["k", "s", "x"], ["b"], bools={"b"})


def test_melt_sql_mirrors_spark(spark):
    import duckdb

    sql = FD.melt_sql(
        "v1",
        "SELECT * FROM src",
        ["k"],
        ["s", "x", "b", "d"],
        bools={"b"},
        strings={"s"},
        dates={"d"},
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW src AS SELECT * FROM (VALUES "
        "(1, 'a', 2.5, TRUE, NULL), "
        "(2, 'b', -1.0, NULL, DATE '2020-03-04')"
        ") t(k, s, x, b, d)"
    )
    orows = {
        (r[3], r[1]): r for r in con.execute(sql).fetchall()
    }  # (metric, k1) -> (variant, k1, k2, metric, val, val_s)
    srows = {
        (r.metric, r.k1): (r.variant, r.k1, r.k2, r.metric, r.val, r.val_s)
        for r in FD.melt_spark(
            _df(spark), "v1", ["k"], ["s", "x", "b", "d"],
            bools={"b"}, strings={"s"}, dates={"d"},
        ).collect()
    }
    assert orows == srows
