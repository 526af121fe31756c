"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only stateful construct is the keyed latest-wins upsert
(its Lambda consumer + Iceberg MERGE); this is the north-star extension
beyond it (SURVEY 2.6): arbitrary per-key state maintained across
micro-batches with Arrow-batched pandas logic -- here, per-user lifetime
activity stats (event count, exact quantized value total, last-seen
event time).

One shared accumulator body serves both execution modes:

- **streaming**: ``user_stats_stream`` wraps it in
  ``applyInPandasWithState`` (GroupState holds the running triple; each
  micro-batch emits the updated row per touched user -- ``update`` mode).
- **batch**: ``user_stats_batch`` runs the same body once per group via
  ``applyInPandas`` with empty initial state, so the DuckDB oracle can
  certify the accumulator arithmetic end-to-end.

Portability: the value total is quantized ``floor(value * 1e6)`` int64
(functions/vectors.py discipline) -- each element is a single IEEE
double multiply+floor, the sum is exact int64, so batch output matches
DuckDB bit-for-bit. State stays bounded: three int64s per user, and at
100 TB the shuffle is one exchange on user_id with Arrow batches per
group (no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value_q long, last_ts timestamp"
STATE_SCHEMA = "n bigint, total_q bigint, last_ts_us bigint"

_SCALE = 1_000_000


def _accumulate(
    pdf: pd.DataFrame, n: int, total_q: int, last_ts_us: int
) -> tuple[int, int, int]:
    """Fold one Arrow batch into the (count, quantized-total, last-ts) state."""
    n += len(pdf)
    # floor(v * 1e6) per element in float64 (exact: |v|*1e6 << 2^53),
    # then exact int64 sum -- bitwise identical to the SQL twin.
    total_q += int(np.floor(pdf["value"].to_numpy() * _SCALE).astype("int64").sum())
    ts_us = pdf["ts"].astype("int64") // 1_000  # pandas nanos -> micros
    last_ts_us = max(last_ts_us, int(ts_us.max()))
    return n, total_q, last_ts_us


def _emit(user_id: int, n: int, total_q: int, last_ts_us: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value_q": [total_q],
            "last_ts": [pd.Timestamp(last_ts_us, unit="us")],
        }
    )


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: merge this batch's rows into the
    user's running state and emit the refreshed row."""
    n, total_q, last_ts_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        if len(pdf):
            n, total_q, last_ts_us = _accumulate(pdf, n, total_q, last_ts_us)
    state.update((n, total_q, last_ts_us))
    yield _emit(key[0], n, total_q, last_ts_us)


def user_stats_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime stats (update mode, unbounded keys --
    pair with a timeout in deployments where the key space churns)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _batch_group(pdf: pd.DataFrame) -> pd.DataFrame:
    n, total_q, last_ts_us = _accumulate(pdf, 0, 0, 0)
    return _emit(int(pdf["user_id"].iloc[0]), n, total_q, last_ts_us)


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same accumulator over each full group."""
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        _batch_group, OUTPUT_SCHEMA
    )


USER_STATS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_q,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""
