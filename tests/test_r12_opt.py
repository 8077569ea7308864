"""Round-12 optimization-round tests: each optimization that changed an
operator's internals gets a differential pin against the original
implementation (results must be identical — the optimization contract).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest


def _canon(rows):
    return sorted(
        (r["user_id"], r["ts"], None if r["value"] is None else round(r["value"], 9), r["filled"])
        for r in rows
    )


@pytest.mark.parametrize("freq", ["1h", "1D"])
def test_resample_vectorized_matches_grouped_map(spark, freq):
    """The partition-wise mapInPandas resample must reproduce the
    applyInPandas reference exactly: same grids, same last-per-bin
    values, same filled flags, same leading-row drops — including keys
    with null values, all-null keys, and multi-day gaps."""
    from flink_template_spark.operators.resample import (
        resample_ffill,
        resample_ffill_grouped,
    )

    rng = random.Random(12)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for uid in range(1, 9):
        n = rng.randint(1, 40)
        for _ in range(n):
            ts = base + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 20))
            val = None if rng.random() < 0.3 else round(rng.uniform(-5, 5), 3)
            rows.append((uid, ts, val))
    # key 99: every value null -> grouped-map emits nothing for it
    rows.append((99, base + dt.timedelta(hours=3), None))
    rows.append((99, base + dt.timedelta(hours=9), None))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    fast = _canon(resample_ffill(df, freq=freq).collect())
    ref = _canon(resample_ffill_grouped(df, freq=freq).collect())
    assert fast == ref
    assert len(fast) > 0
