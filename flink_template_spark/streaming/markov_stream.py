"""Streaming Markov transition counter (per-user event sequences).

The streaming dual of the batch transition matrix
(plans.events_time.q_event_markov): the batch query LAGs over a
finished log; a live product-analytics pipeline wants the transition
counts maintained AS events arrive. Per user, the only state a
first-order chain needs is the LAST event (type + its order key) —
each arriving event emits one (prev_type -> type) increment and
replaces the state.

Operator shape: ``applyInPandasWithState`` keyed by user — state is
(last_type, last_order) per user, O(|users|) forever, no watermark
needed (NoTimeout; a production deployment with unbounded user churn
would add a state TTL — the reference pattern is the CUSUM monitor's).
Within each micro-batch rows fold in a DETERMINISTIC total order
(ts, event_id), so a replayed batch produces identical state and
identical emitted increments; across batches the chain is a left fold
(the state carries the boundary event), so micro-batch splits are
invisible: the summed increments equal the batch LAG over the same
ordered rows — pinned stream==batch in tests/test_markov_stream.py.

Emission contract: UPDATE-mode per-batch AGGREGATED increments
(from_type, to_type, n) per user-batch — a downstream keyed sum (or
foreachBatch upsert into a counts table, sinks.py's pattern) folds
them into the global matrix. Emitting increments instead of absolute
counts keeps the sink merge commutative and idempotent per epoch.

At 100 TB: parallelism is the user key, exactly like any keyed
stateful operator; the transition matrix itself is |types|^2 and
lives in the SINK, not in stream state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (last_ts, last_id) = the last event's full order key (microsecond
# timestamp + event id): the cross-batch out-of-order guard
# (transitions_fold fails loudly on regression). Both components are
# carried because the batch dual's total order is (ts, event_id) —
# a ts-only guard would silently pass same-microsecond events split
# across batches in inverted id order (r8 self-review, second pass).
STATE_SCHEMA = "last_type STRING, last_ts LONG, last_id LONG"
OUTPUT_SCHEMA = "user_id LONG, from_type STRING, to_type STRING, n LONG"


def transitions_fold(
    events: list[tuple[str, int, int]],
    state: tuple[str | None, int, int],
) -> tuple[dict[tuple[str, str], int], tuple[str | None, int, int]]:
    """Pure fold both the operator and the tests share: given
    (type, ts, id) events SORTED by (ts, id) and the carried
    (last_type, last_ts, last_id) state, return the transition
    increments and the new state.

    ``(last_ts, last_id)`` is the cross-batch ordering GUARD (r8
    self-review: it must be load-bearing, not dead state): an event
    ordered before the state's last event — in the batch dual's FULL
    (ts, event_id) order, so a same-microsecond pair split across
    batches in inverted id order is also caught — means a later
    micro-batch delivered earlier data, the one condition under which
    the summed increments would silently diverge from the batch LAG
    matrix; it fails LOUDLY (killing the query) instead. Equality is
    rejected the same way (ADVICE r8): event ids are unique, so an
    event (ts, id)-equal to the folded state can only be an
    at-least-once re-delivery, which would double-count its inbound
    transition. The operator therefore requires per-key strictly
    (ts, id)-ordered, exactly-once arrival across batches (time-split
    files, or Kafka's per-key ordering with idempotent producers)."""
    last_type, last_ts, last_id = state
    inc: dict[tuple[str, str], int] = {}
    for etype, ts, eid in events:
        if last_type is not None:
            if (ts, eid) < (last_ts, last_id):
                raise ValueError(
                    "out-of-order arrival across micro-batches: event at "
                    f"({ts}, {eid}) after state ({last_ts}, {last_id}); "
                    "stream would diverge from the batch transition matrix"
                )
            if (ts, eid) == (last_ts, last_id):
                # ADVICE r8: an at-least-once source re-delivering the
                # exact last event must not silently double-count the
                # transition into it. event_id is unique in a correct
                # stream, so (ts, id) equality can only be re-delivery —
                # fail as loudly as the out-of-order case.
                raise ValueError(
                    "duplicate re-delivery across micro-batches: event at "
                    f"({ts}, {eid}) equals the folded state; counting it "
                    "again would diverge from the batch transition matrix"
                )
            k = (last_type, etype)
            inc[k] = inc.get(k, 0) + 1
        last_type, last_ts, last_id = etype, ts, eid
    return inc, (last_type, last_ts, last_id)


def _markov_fn():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev = state.get if state.exists else (None, -1, -1)
        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic within-batch order: replays fold identically
        rows = rows.sort_values(["order_ts", "order_id"], kind="mergesort")
        inc, cur = transitions_fold(
            list(
                zip(
                    rows["event_type"],
                    (int(i) for i in rows["order_ts"]),
                    (int(i) for i in rows["order_id"]),
                )
            ),
            (prev[0], int(prev[1]), int(prev[2])),
        )
        state.update(cur)
        if inc:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "from_type": a,
                        "to_type": b,
                        "n": n,
                    }
                    for (a, b), n in sorted(inc.items())
                ]
            )

    return fn


def markov_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Keyed streaming transition counter: emits per-user aggregated
    (from_type, to_type, n) increments once per micro-batch the user
    appears in (update mode). Sum the increments downstream to get the
    global matrix — equal to the batch LAG transition counts over the
    same ordered rows."""
    keyed = stream.select(
        F.col(key_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        # microsecond precision: a seconds cast would reorder same-second
        # events relative to the batch dual's full-timestamp ordering
        F.unix_micros(F.col(ts_col)).alias("order_ts"),
        F.col(id_col).cast("long").alias("order_id"),
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _markov_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
