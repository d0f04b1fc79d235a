"""Stateful streaming twin of pipeline.rolling_zscore_anomaly —
applyInPandasWithState with a bounded per-key trailing window.

The batch operator's semantics translate directly: GroupState holds the
last `window_rows` scaled values per key (oldest first); each arriving
event is flagged against the state BEFORE being appended (the baseline
excludes the current row — the same algebraic point the batch docstring
makes), then pushed into the window. State is hard-bounded at
window_rows values per key no matter how long the stream runs — the
same bounded-state story as the HLL/CMS twins, but with EXPLICIT
eviction.

Arithmetic is the identical cross-multiplied integer test, so on
in-order delivery the stream's flags are bit-equal to the batch
operator's (pinned in tests/test_stateful_streaming.py: single-batch
equality against the batch flags, plus a direct two-chunk state-carry
unit test). Events are sorted by (ts, id) INSIDE each micro-batch;
cross-batch order is the file-source delivery order — the usual
streaming contract (out-of-order delivery needs the watermark layer,
which this monitor deliberately sits below).

The state rides as a comma-joined string of scaled BIGINTs — flat,
schema-stable, and readable in a state-store dump.

[NOT IN REFERENCE — executor.py has no streaming surface.]
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WINDOW_ROWS = 20
SIGMAS = 3
VALUE_SCALE = 1000

ANOMALY_OUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("v_scaled", LongType()),
        StructField("n_win", LongType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

ANOMALY_STATE = StructType([StructField("vals", StringType())])


def _round_half_away(x: float) -> int:
    """Spark's F.round (HALF_UP = away from zero), NOT python's banker's
    round — keeps stream/batch scaled values identical on exact halves."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def apply_chunk(
    vals: list[int],
    events: list[tuple[int, float]],
    *,
    window_rows: int = WINDOW_ROWS,
    sigmas: int = SIGMAS,
    value_scale: int = VALUE_SCALE,
) -> tuple[list[int], list[tuple[int, int, int, bool]]]:
    """Pure-python core (unit-testable without Spark): fold ordered
    (event_id, value) pairs through the trailing window `vals`,
    returning (new_vals, [(event_id, v_scaled, n_win, flag), ...])."""
    out = []
    for eid, val in events:
        v = _round_half_away(val * value_scale)
        n = len(vals)
        flag = False
        if n >= 2:
            s = sum(vals)
            sq = sum(x * x for x in vals)
            var_n2 = n * sq - s * s
            flag = var_n2 > 0 and (n * v - s) ** 2 > sigmas * sigmas * var_n2
        out.append((eid, v, n, flag))
        vals = (vals + [v])[-window_rows:]
    return vals, out


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    vals = (
        [int(x) for x in state.get[0].split(",") if x] if state.exists else []
    )
    eids: list[int] = []
    vs: list[int] = []
    ns: list[int] = []
    flags: list[bool] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        vals, rows = apply_chunk(
            vals,
            [(int(e), float(v)) for e, v in zip(pdf["event_id"], pdf["value"])],
        )
        for eid, v, n, f in rows:
            eids.append(eid)
            vs.append(v)
            ns.append(n)
            flags.append(f)
    state.update((",".join(map(str, vals)),))
    yield pd.DataFrame(
        {"event_id": eids, "v_scaled": vs, "n_win": ns, "is_anomaly": flags}
    )


def streaming_rolling_zscore(events: DataFrame) -> DataFrame:
    """Live per-user anomaly flags over an event stream (append output:
    each event's flag is final the moment it is evaluated)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=ANOMALY_OUT,
        stateStructType=ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
