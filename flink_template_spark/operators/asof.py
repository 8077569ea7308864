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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the right payload nearest its
    timestamp. ``direction="backward"`` (default) attaches the latest
    right row with right.ts <= left.ts; ``"forward"`` attaches the
    earliest right row with right.ts >= left.ts (the pandas
    ``merge_asof`` pair). Right side must be unique per (key, right_ts).

    Both directions are the same one-shuffle sort-merge: only the sort
    tiebreak (which side wins at equal ts) and the carry direction
    (last-over-preceding vs first-over-following) flip."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # at equal ts the right row must be visible to the left row in both
    # directions: backward scans preceding (right sorts first), forward
    # scans following (left sorts first).
    left_mark, right_mark = (1, 0) if direction == "backward" else (0, 1)
    l_marked = left.withColumn("__side", F.lit(left_mark)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_marked = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in payload_cols],
        )
        .withColumn("__side", F.lit(right_mark))
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

    w_base = W.partitionBy(key).orderBy("__ts", "__side")
    if direction == "backward":
        w = w_base.rowsBetween(W.unboundedPreceding, W.currentRow)
        carry = lambda c: F.last(  # noqa: E731
            F.when(F.col("__side") == right_mark, F.col(c)), ignorenulls=True
        ).over(w)
    else:
        w = w_base.rowsBetween(W.currentRow, W.unboundedFollowing)
        carry = lambda c: F.first(  # noqa: E731
            F.when(F.col("__side") == right_mark, F.col(c)), ignorenulls=True
        ).over(w)
    filled = unioned.select(
        "*", *[carry(c).alias(f"__asof_{c}") for c in payload_cols]
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_{c}").alias(c) for c in payload_cols
    ]
    return filled.filter(F.col("__side") == left_mark).select(*out_cols)
