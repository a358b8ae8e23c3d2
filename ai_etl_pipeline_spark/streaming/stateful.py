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
