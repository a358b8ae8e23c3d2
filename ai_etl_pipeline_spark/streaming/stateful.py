"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.7 plan — 'applyInPandasWithState for custom stateful
operators').

``running_user_totals`` keeps (count, sum) per user across micro-batches
and emits the updated totals for users seen in each batch — the shape of
any incremental per-entity accumulator (feature stores, rate counters,
running aggregates that built-in windowed aggs can't express).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "user_id long, n_events long, total_value double"
STATE_DDL = "n long, total double"


def _accumulate(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) over a stream. State lives in
    the state store (RocksDB/HDFS-backed on a cluster), one entry per
    user — bounded by entity cardinality, not stream length."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_K = 8
EWMA_OUTPUT_DDL = "user_id long, event_type string, n_events long, ewma_micro long"
# ring buffer of the last EWMA_K readings + total count + write index —
# fixed-width state (entity-bounded, stream-length-free), the state-store
# contract applyInPandasWithState requires
EWMA_STATE_DDL = "n long, i long, " + ", ".join(f"v{j} long" for j in range(EWMA_K))


def _ewma_step(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    if state.exists:
        st = list(state.get)
    else:
        st = [0, 0] + [0] * EWMA_K
    n, i, ring = st[0], st[1], st[2:]
    batch = pd.concat(list(pdfs), ignore_index=True)
    # micro-batch arrival order is not event order: impose the SAME
    # total order the batch operator uses (ts, then event_id)
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    for v in batch["value"]:
        ring[i % EWMA_K] = math.floor(float(v) * 1000000.0)
        i += 1
        n += 1
    state.update(tuple([n, i] + ring))
    if n >= EWMA_K:
        # newest reading weighs 2^(K-1), oldest kept weighs 1
        num = 0
        for back in range(EWMA_K):
            num += ring[(i - 1 - back) % EWMA_K] * (1 << (EWMA_K - 1 - back))
        ewma = num // ((1 << EWMA_K) - 1) if num >= 0 else -((-num) // ((1 << EWMA_K) - 1))
        ew = pd.array([ewma], dtype="Int64")
    else:
        ew = pd.array([None], dtype="Int64")
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n_events": [n],
            "ewma_micro": ew,
        }
    )


def running_user_ewma(events: DataFrame) -> DataFrame:
    """Streaming integer EWMA (α = 1/2, depth ``EWMA_K``) per (user,
    type) series — the stateful twin of ``behavior.ewma_smooth``: a
    fixed-width ring of the last K micro-unit readings lives in the
    state store, each micro-batch folds its rows in EVENT order (ts,
    event_id — arrival order is not event order), and the emitted row
    is the group's current depth-K EWMA (NULL until K readings exist —
    a partial window would silently change the effective α, same
    contract as the batch operator). Because the operator is a pure
    function of the ordered reading sequence, a single-batch replay is
    bit-equal to the batch operator's LAST row per group — which IS
    the oracle."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _ewma_step,
        outputStructType=EWMA_OUTPUT_DDL,
        stateStructType=EWMA_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
