"""Custom aggregate tier: Arrow-batched grouped-agg pandas UDFs.

The reference's aggregation is a hand-written incremental
``AggregateFunction`` (TripAggregatorApplication.kt:58-164). In this
engine almost every aggregate is a built-in (JVM partial-agg, codegen),
but a complete engine needs the escape hatch for aggregates Spark can't
express: this module is that tier — ``pandas_udf`` with
``PandasUDFType``-style grouped-agg semantics, Arrow transfer, one batch
per group per partition.

Scale note: a grouped-agg pandas UDF does NOT do map-side partial
aggregation — all rows of a group cross the shuffle. That's acceptable
for bounded groups (the reference's per-trip sets are bounded the same
way); for algebraic aggregates always prefer built-ins. The weighted
mean below exists as the *pattern* (and is pinned against an exact
decimal oracle), with integer fixed-point accumulation so the result is
partition-order-independent — the same numeric discipline the rest of
the engine uses (plans/registry.py docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean_cents(price_cents: pd.Series, qty: pd.Series) -> float:
    """Exact weighted mean over fixed-point inputs: int64 sums (exact,
    order-independent), one final IEEE division — reproducible bit-for-
    bit in any engine that does the same integer sums."""
    num = int((price_cents.astype("int64") * qty.astype("int64")).sum())
    den = int(qty.astype("int64").sum())
    return float(num) / float(den) / 100.0 if den else None


@pandas_udf("long")
def count_rows(qty: pd.Series) -> int:
    """Grouped-agg count companion: Spark disallows mixing grouped-agg
    pandas UDFs with built-in aggregates in one ``agg`` call
    (INVALID_PANDAS_UDF_PLACEMENT), so counts ride the same tier."""
    return int(len(qty))
