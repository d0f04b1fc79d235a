"""Session-lifetime DataFrame cache registry.

Some operators persist() an intermediate that is consumed by two branches
of one query plan (self-join / confirm-join sharing points, where exchange
reuse does not fire across join aliases). The persist is correct per query,
but a long-lived session that runs many queries (the grading driver's loop,
bench.py, the oracle sweep) would accumulate cached blocks indefinitely —
a slow memory leak. Operators therefore register every persisted
DataFrame here via ``pin``; query harnesses call ``release_all`` between
queries (bench.py and tools/oracle_check.py do).

Released DataFrames remain valid — Spark recomputes them from lineage on
next use — so releasing is always safe, merely un-memoized.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []
_CALLBACKS: list[Callable[[], None]] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later release_all()."""
    df.persist()
    _PINNED.append(df)
    return df


def on_release(cb: Callable[[], None]) -> None:
    """Register a callback run by release_all() (e.g. clearing a
    module-level DataFrame memo so it cannot hold stale unpersisted refs)."""
    _CALLBACKS.append(cb)


def release_all() -> None:
    for df in _PINNED:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — a dead session must not mask cleanup
            pass
    _PINNED.clear()
    for cb in _CALLBACKS:
        try:
            cb()
        except Exception:  # noqa: BLE001
            pass
