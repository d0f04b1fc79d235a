"""Dtype-faithful witnesses for every folded registry family (VERDICT r10 #4).

The fold (suites/_fold.py) registers each family as ONE melted row whose
driver compare sees doubles/strings — a documented trade (_fold.py:26-31).
These tests close the gap it opens: for every registry row built by
fold_family (found mechanically via the ``__fold_members__`` marker), the
family's WIDEST variant (most metrics — the one exercising the most lanes)
is re-run through its UNFOLDED builder and compared to its ORIGINAL-DTYPE
oracle with the same numeric-kind-sensitive canonicalization the local
sweep uses (tools/oracle_check._canon: ``i:``/``f:``/``d:`` tags), so an
int-vs-double or Decimal divergence a melted compare would mask fails
loudly here.

The enumeration itself is the lint: test_every_fold_family_enumerated
fails if a fold_family call site ever registers a family this module does
not witness.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

_OC_PATH = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle_check.py")
_spec = importlib.util.spec_from_file_location("oracle_check", _OC_PATH)
_oc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_oc)


def _folded_rows():
    """(family_name, fold_fn) for every registry row built by fold_family."""
    from executor_u1mindexer_spark.suites import merged

    queries, _ = merged()
    return [(n, fn) for n, fn in queries.items() if hasattr(fn, "__fold_members__")]


def _widest(members):
    return max(members, key=lambda m: len(m[2]))


FOLDED = _folded_rows()


def test_every_fold_family_enumerated():
    # the lint half: every fold_family call site must surface here — a new
    # family is witnessed automatically, a renamed marker fails loudly
    names = sorted(n for n, _ in FOLDED)
    assert names, "no folded rows found — the __fold_members__ marker moved?"
    for _, fn in FOLDED:
        assert fn.__fold_members__ and fn.__fold_sources__
    # pin today's family set so silently LOSING the marker on one family
    # (e.g. a suite bypassing fold_family) is a visible diff, not a skip
    assert names == [
        "agg_approx_family",
        "grouping_analytics",
        "scalar_funcs",
        "sketch_ams",
        "sketch_bloom",
        "sketch_cms",
        "sketch_hll",
        "sketch_quantile",
        "source_format_roundtrips",
        "window_funcs",
    ]


@pytest.mark.parametrize("family", sorted(n for n, _ in FOLDED))
def test_widest_variant_dtype_faithful(spark, family):
    fn = dict(FOLDED)[family]
    variant, keys, metrics, lanes = _widest(fn.__fold_members__)
    vqueries, voracles = fn.__fold_sources__

    sdf = vqueries[variant](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    for t in _oc.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    at = con.execute(voracles[variant]).fetch_arrow_table()
    ocols = list(at.column_names)
    orows = [tuple(_oc._py(d[c]) for c in ocols) for d in at.to_pylist()]

    assert sorted(scols) == sorted(ocols), f"{variant}: column sets differ"
    assert len(srows) == len(orows), f"{variant}: rowcount differs"
    sh = _oc._hash_rows(scols, srows)
    oh = _oc._hash_rows(ocols, orows)
    if sh != oh:
        pytest.fail(
            f"{family}.{variant} dtype-faithful mismatch: "
            + _oc._first_diff(scols, srows, orows)
        )
