"""Streaming CUSUM drift monitor (per-source change detection).

The streaming complement of the batch KS drift audit
(plans.quality.q_ks_source_drift): KS answers "has this source's
distribution drifted" over a finished corpus snapshot; a live ingest
wants the alarm DURING the batch that drifts. The two-sided CUSUM
(Page 1954) is the standard sequential detector: per source, maintain

    S_hi <- max(0, S_hi + (x - mu - slack))
    S_lo <- max(0, S_lo + (mu - x - slack))

and raise an alarm (then reset that side) whenever either side crosses
the decision threshold ``h``. ``mu`` is the reference mean from the
last trusted snapshot; ``slack`` absorbs in-control noise so only a
sustained shift accumulates.

Operator shape: ``applyInPandasWithState`` keyed by source — state is
four numbers per source (two sums, rows seen, alarms raised), so state
size is O(|sources|) forever, no watermark needed (NoTimeout). Within
each micro-batch rows are folded in a DETERMINISTIC total order
(doc_id) so a replayed batch produces the identical state; across
batches CUSUM is a left fold, so micro-batch boundaries don't change
the result — the stream equals the one-pass batch fold over the same
ordered rows (pinned in tests/test_drift_stream.py).

At 100 TB: the per-source fold is sequential BY DEFINITION (CUSUM is
an order-dependent statistic); parallelism comes from the source key,
exactly like any keyed stateful operator. Integer inputs keep the
sums exact (values and mu are ints scaled by ``SCALE``; no float
accumulation anywhere).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCALE = 100  # fixed-point: value*SCALE stays integer for mu like 1234.56

STATE_SCHEMA = (
    "s_hi LONG, s_lo LONG, n_seen LONG, n_alarms LONG"
)
OUTPUT_SCHEMA = (
    "source STRING, n_seen LONG, s_hi LONG, s_lo LONG, n_alarms LONG"
)


def cusum_fold(
    values: list[int],
    mu_scaled: int,
    slack_scaled: int,
    h_scaled: int,
    state: tuple[int, int, int, int] = (0, 0, 0, 0),
) -> tuple[int, int, int, int]:
    """Pure integer CUSUM fold (the reference both the operator and the
    tests use). ``values`` are SCALE-scaled ints in processing order."""
    s_hi, s_lo, n_seen, n_alarms = state
    for x in values:
        s_hi = max(0, s_hi + (x - mu_scaled - slack_scaled))
        s_lo = max(0, s_lo + (mu_scaled - x - slack_scaled))
        n_seen += 1
        if s_hi > h_scaled:
            n_alarms += 1
            s_hi = 0
        if s_lo > h_scaled:
            n_alarms += 1
            s_lo = 0
    return s_hi, s_lo, n_seen, n_alarms


def _monitor_fn(mu_scaled: int, slack_scaled: int, h_scaled: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev = state.get if state.exists else (0, 0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic within-batch order: replays fold identically
        rows = rows.sort_values("order_key", kind="mergesort")
        cur = cusum_fold(
            [int(v) for v in rows["value"]],  # pre-scaled in monitor_stream
            mu_scaled,
            slack_scaled,
            h_scaled,
            prev,
        )
        state.update(cur)
        yield pd.DataFrame(
            [
                {
                    "source": key[0],
                    "n_seen": cur[2],
                    "s_hi": cur[0],
                    "s_lo": cur[1],
                    "n_alarms": cur[3],
                }
            ]
        )

    return fn


def monitor_stream(
    stream: DataFrame,
    mu: float,
    slack: float,
    h: float,
    key_col: str = "source",
    value_col: str = "n_chars",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keyed streaming CUSUM: emits each source's updated
    (n_seen, s_hi, s_lo, n_alarms) once per micro-batch it appears in
    (update mode). ``mu``/``slack``/``h`` AND the value column are all
    quantized to the fixed SCALE here — scale-then-round, so a
    fractional value column keeps its centi-precision like the
    reference parameters do (ADVICE r6: the old cast-to-long-THEN-scale
    floor-truncated fractional values while mu kept its decimals);
    all downstream arithmetic is integer.

    Quantization exactness (r7 self-review): an INTEGER-typed value
    column scales as an exact long multiply — never through double,
    whose 2^53 mantissa would corrupt large counters (byte totals,
    token counts) by whole SCALE units per row; values past the
    2^63/SCALE scaling headroom fail LOUDLY (assert_true) instead of
    wrapping int64 into a spurious low-side alarm. Fractional columns
    take the double path with ``bround`` (HALF_EVEN), the same
    tie-break Python's ``round`` applies to mu/slack/h — an in-control
    stream sitting exactly on a .5-tie mean must quantize to the SAME
    value as the reference mean or it drifts +1 unit per row into a
    spurious alarm."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    vtype = stream.schema[value_col].dataType
    if isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        headroom = (1 << 63) // SCALE - 1
        v = F.col(value_col).cast("long")
        # NULL contract (ADVICE r8): a NULL metric value is a data
        # defect in a monitoring stream — the guard condition is made
        # explicitly null-rejecting so the abort is a documented
        # contract (assert_true also raises on a NULL condition, but
        # relying on that side effect left the behavior unpinned).
        value = F.when(
            F.assert_true(
                v.isNotNull() & (F.abs(v) <= headroom),
                F.concat(
                    F.lit("CUSUM value NULL or exceeds scaling headroom: "),
                    F.coalesce(v.cast("string"), F.lit("NULL")),
                ),
            ).isNull(),
            v * SCALE,  # exact within ±2^63/SCALE, loud beyond
        )
    else:
        # Same loud headroom guard as the integer path (ADVICE r7): a
        # double beyond 2^63/SCALE would silently clamp to Long.MaxValue
        # on the cast and corrupt the CUSUM sums. float() of the integer
        # bound rounds UP (the bound is not representable), which would
        # re-open a boundary window where the guard passes but the cast
        # still clamps — step one ulp DOWN so the admitted range is
        # strictly clamp-safe (r8 self-review).
        import math

        headroom = math.nextafter(float((1 << 63) // SCALE - 1), 0.0)
        d = F.col(value_col).cast("double")
        # same explicit NULL-rejecting contract as the integer path
        # (ADVICE r8); NaN also fails here since NaN <= x is false
        value = F.when(
            F.assert_true(
                d.isNotNull() & (F.abs(d) <= headroom),
                F.concat(
                    F.lit("CUSUM value NULL or exceeds scaling headroom: "),
                    F.coalesce(d.cast("string"), F.lit("NULL")),
                ),
            ).isNull(),
            F.bround(d * SCALE).cast("long"),
        )
    keyed = stream.select(
        F.col(key_col).alias("source"),
        value.alias("value"),
        F.col(order_col).cast("long").alias("order_key"),
    ).groupBy("source")
    return keyed.applyInPandasWithState(
        _monitor_fn(round(mu * SCALE), round(slack * SCALE), round(h * SCALE)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
