"""Streaming trending top-k (per-window leaderboard with event-time
timers).

The streaming dual of "daily top event types" (batch:
window + count + row_number ≤ k): a live pipeline wants each day's
leaderboard EMITTED ONCE, when the watermark says the day is complete —
not recomputed per batch, not held forever.

Operator shape: ``applyInPandasWithState`` keyed by WINDOW START (the
tumbling bucket is the key, unlike the user-keyed operators), with
**EventTimeTimeout**: every batch folds that window's per-type counts
into state (two parallel arrays — a fixed struct schema can't hold a
map of unknown keys) and arms a timer at window_end; when the
watermark passes it, the timed-out invocation emits the final ranked
top-k for the window and REMOVES the state — per-window state lives
exactly [first event, watermark past end], the textbook bounded-state
windowed aggregate. Appended output is final (append mode, not
update): safe for exactly-once file/JDBC sinks.

Determinism: within a batch pandas aggregates per-type counts (order
invariant — integer sums); ranking ties break by type name, so a
replay emits identical rows. Cross-batch the fold is count addition —
commutative, batch-split invisible — pinned stream==batch against the
window+row_number dual in tests/test_topk_stream.py.

At 100 TB: parallelism is the window key — coarse (one task per
window) by design here; a high-cardinality deployment keys by
(window, shard) and merges the k·shards candidates downstream, the
standard two-level top-k. |state| = |open windows| · |types|.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "types ARRAY<STRING>, counts ARRAY<LONG>"
OUTPUT_SCHEMA = "window_start TIMESTAMP, event_type STRING, n LONG, rk INT"

TOP_K = 3


def topk_fold(
    batch_counts: dict[str, int], state: tuple[list[str], list[int]]
) -> tuple[list[str], list[int]]:
    """Pure fold the operator and the tests share: merge a batch's
    per-type counts into the carried (types, counts) arrays."""
    types, counts = list(state[0]), list(state[1])
    idx = {t: i for i, t in enumerate(types)}
    for t, c in batch_counts.items():
        if t in idx:
            counts[idx[t]] += c
        else:
            types.append(t)
            counts.append(c)
    return types, counts


def topk_rank(
    types: list[str], counts: list[int], k: int = TOP_K
) -> list[tuple[str, int, int]]:
    """Deterministic leaderboard: (type, n, rank), count desc then
    type asc with a null type sorting LAST (matching Spark's NULLS
    LAST ascending default, and None is not str-comparable anyway)."""
    order = sorted(
        zip(types, counts),
        key=lambda tc: (-tc[1], tc[0] is None, tc[0] or ""),
    )
    return [(t, c, i + 1) for i, (t, c) in enumerate(order[:k])]


def _topk_fn(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            types, counts = state.get
            state.remove()
            rows = [
                {
                    "window_start": key[0],
                    "event_type": t,
                    "n": c,
                    "rk": r,
                }
                for t, c, r in topk_rank(list(types), list(counts), k)
            ]
            if rows:
                yield pd.DataFrame(rows)
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch_counts = batch.groupby("event_type", dropna=False).size().to_dict()
        # dropna=False: the batch dual (DataFrame groupBy) keeps a null
        # type group; pandas would silently drop it (r9 review). The
        # NaN group key normalizes to None — NaN != NaN, so raw NaN
        # keys would append a fresh state entry every batch.
        prev = tuple(state.get) if state.exists else ([], [])
        types, counts = topk_fold(
            {
                (None if pd.isna(t) else t): int(c)
                for t, c in batch_counts.items()
            },
            (list(prev[0]), list(prev[1])),
        )
        state.update((types, counts))
        # fire when the watermark passes the end of this window
        state.setTimeoutTimestamp(int(batch["window_end_ms"].iloc[0]))
        return
        yield  # pragma: no cover - generator marker

    return fn


def trending_topk_stream(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = "1 minute",
    k: int = TOP_K,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-tumbling-window top-k event types, emitted once per window
    when the watermark closes it (append semantics)."""
    w = F.window(F.col(ts_col), window)
    keyed = (
        stream.select(
            F.col(ts_col),
            w["start"].alias("window_start"),
            F.unix_millis(w["end"]).alias("window_end_ms"),
            F.col(type_col).alias("event_type"),
        )
        # the watermark tag must survive into the grouped frame, so it
        # is applied to a RETAINED event-time column after the select
        .withWatermark(ts_col, watermark)
        .groupBy("window_start")
    )
    return keyed.applyInPandasWithState(
        _topk_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
