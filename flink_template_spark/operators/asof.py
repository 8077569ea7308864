"""Distributed as-of join (the operator Spark lacks natively).

Semantics: for each left row, attach the most recent right row with the
same key and right.ts <= left.ts (ties on right.ts must be pre-resolved
by the caller so the result is deterministic).

Implementation — the scalable sort-merge trick, not a range cross-join:
union both sides with a side marker, hash-partition by key, sort by
(ts, side) within the window, and carry the right payload forward with
``last(..., ignorenulls=True)``. One shuffle, no row explosion, works at
any scale (vs the naive ``l JOIN r ON key AND r.ts <= l.ts`` + argmax,
which is O(|l|·|r|) per key).

Reference parity: the reference has no joins at all (SURVEY.md §2.5);
this is part of the engine's added relational surface for telemetry
enrichment (e.g. attach the last known order/config to each event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + latest right payload at or before
    its timestamp. Right side must be unique per (key, right_ts)."""
    l_marked = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_marked = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in payload_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union
    for c in l_marked.columns:
        if c not in r_marked.columns:
            r_marked = r_marked.withColumn(c, F.lit(None))
    for c in payload_cols:
        if c not in l_marked.columns:
            l_marked = l_marked.withColumn(c, F.lit(None))
    unioned = l_marked.select(*sorted(l_marked.columns)).unionByName(
        r_marked.select(*sorted(r_marked.columns))
    )

    # right rows sort before left rows at equal ts (side 0 < 1) so a right
    # row at exactly left.ts is visible to that left row (<= semantics).
    w = (
        W.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in payload_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_{c}").alias(c) for c in payload_cols
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)
