"""Streaming twins of the mergeable sketches — live HLL / CMS maintenance.

The sketch states are the rare aggregations whose streaming form is
STRICTLY bounded: the HLL state is at most 2^p (register, max_rank) rows
and the CMS state at most d*w counter rows, regardless of how long the
stream runs — unlike the dedup ledger (state grows with unique content)
or windowed aggregates (state grows with time until the watermark seals
windows). Updates are monotone folds (max / count), so each arriving
record is an O(1) state touch, and the in-flight state IS the artifact a
rollup pipeline would checkpoint: no separate batch rebuild needed.

The projection (hash, register, rank / counter coordinates) is the SAME
generated Catalyst expression text as the batch operators in
operators/sketch.py, so the streaming result is bit-identical to the
batch sketch of the drained backlog — pinned by tests/test_streaming.py
against hll_registers / cms_state as the oracle. [NOT IN REFERENCE —
executor.py has no streaming surface.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from executor_u1mindexer_spark.operators import sketch as SK


def streaming_hll_registers(stream: DataFrame, col: str, p: int = 10) -> DataFrame:
    """Streaming HLL register maintenance (complete-mode grouped max).

    The batch operator IS the streaming plan: a stateless codegen
    projection + one grouped monotone aggregate, which Structured
    Streaming runs incrementally with bounded state. Delegating keeps the
    two forms bit-identical by construction."""
    return SK.hll_registers(stream, col, p)


def streaming_cms_state(
    stream: DataFrame, col: str, d: int = SK.D_DEFAULT, w: int = 256
) -> DataFrame:
    """Streaming CMS counter maintenance (complete-mode grouped count);
    delegates like streaming_hll_registers."""
    return SK.cms_state(stream, col, d, w)
