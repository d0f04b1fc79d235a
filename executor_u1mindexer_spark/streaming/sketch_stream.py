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


def streaming_quantile_state_fold(
    stream: DataFrame,
    value_col: str,
    id_col: str,
    p: int = 8,
    s: int = 64,
):
    """Streaming form of the equi-depth quantile sketch (r06).

    Unlike HLL/CMS (monotone folds that stream as incremental grouped
    aggregates), the equi-depth state needs a per-bucket SORT, which
    Structured Streaming cannot run incrementally — so the streaming
    shape is the one operators/quantile.py documents: ONE bounded state
    PER MICRO-BATCH (tagged by batch id, exactly quantile_merge's `src`
    column), accumulated driver-side; rank queries run over the merged
    tiny states. Returns (writer, states) where `states` is the
    driver-side accumulator — a dict KEYED BY batch_id (ADVICE r06):
    foreachBatch can RE-DELIVER a batch id after failure/restart, and an
    append-only list would double-count that batch's rows in merged rank
    queries (n_total and targets inflate); overwriting the key makes the
    fold idempotent under redelivery. Each entry is <= p*s rows
    regardless of batch size, which is what makes the driver-side fold
    legitimate. Restart semantics: the dict lives in THIS process — a new
    driver process starts empty and (with a checkpoint) only sees batches
    not yet committed, so persist entries externally keyed by batch_id if
    states must survive the driver."""
    from executor_u1mindexer_spark.operators import quantile as QT

    states: dict[int, list] = {}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        st = QT.quantile_state(batch_df, value_col, id_col, p, s)
        rows = st.collect()
        states[int(batch_id)] = [
            (int(batch_id), r.bucket, r.tile, r.rep_value, r.weight)
            for r in rows
        ]

    writer = stream.writeStream.foreachBatch(fold)
    return writer, states


def streaming_gram_fold(stream: DataFrame, vec_col: str = "embedding"):
    """Streaming form of the exact Gram-moment accumulation (r07,
    operators/linalg.py): second moments are ORDER-FREE BIGINT sums, so
    the stream fold is the same d(d+1)/2-entry state summed across
    micro-batches — bounded state regardless of stream length, like the
    HLL/CMS twins. Per batch: the distributed partial-Gram kernel
    reduces the batch to <= d(d+1)/2 rows, collected and summed
    driver-side. The accumulator is KEYED BY batch_id (the
    streaming_quantile_state_fold idempotence contract): foreachBatch
    redelivery overwrites rather than double-counts. merged_moments()
    returns rows shaped like gram_moments' output, bit-equal to the
    batch operator over the drained backlog (pinned in
    tests/test_streaming.py)."""
    from executor_u1mindexer_spark.operators import linalg as L

    states: dict[int, dict] = {}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        rows = L.gram_moments(batch_df, vec_col=vec_col).collect()
        states[int(batch_id)] = {
            (r.i, r.j): (r.n, r.sum_qi, r.sum_qj, r.sum_qq) for r in rows
        }

    def merged_moments() -> dict:
        acc: dict = {}
        for st in states.values():
            for key, (n, si, sj, sqq) in st.items():
                if key in acc:
                    a = acc[key]
                    acc[key] = (a[0] + n, a[1] + si, a[2] + sj, a[3] + sqq)
                else:
                    acc[key] = (n, si, sj, sqq)
        return acc

    writer = stream.writeStream.foreachBatch(fold)
    return writer, states, merged_moments
