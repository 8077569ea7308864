"""SCD Type-2 dimension maintenance (history-preserving merge).

The warehouse-side counterpart of the reference's accumulate-upsert sink
(TripAggregatorApplication.kt:227-233 mutates in place; SCD2 instead
closes the old version and opens a new one, preserving history for
as-of joins). Pure DataFrame algebra, one shuffle on the business key:

- rows in ``updates`` whose tracked attributes changed → the current
  version is closed (``valid_to`` = effective date, ``is_current`` =
  false) and a new open version is appended;
- unchanged updates are no-ops (no version churn);
- brand-new keys open their first version;
- historical (already-closed) rows pass through untouched.

Scale: both inputs are projected to key + tracked attrs before the
join; the merge is a left-outer join keyed on the business key plus a
union — no windows, no driver collection. Works identically inside a
``foreachBatch`` for streaming CDC ingestion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective: Column,
    end_of_time: str = "9999-12-31",
) -> DataFrame:
    """Return the new dimension table.

    ``dim`` columns: key, *tracked, valid_from date, valid_to date,
    is_current boolean. ``updates`` columns: key, *tracked.
    ``effective`` is the batch's effective date Column (applied to all
    changes — CDC batches carry one effective date; pass a per-row
    column for backfills)."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    changed_cond = F.lit(False)
    for c in tracked:
        changed_cond = changed_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    u = updates.alias("upd")
    c = cur.alias("cur")
    joined = c.join(u, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer")

    is_new_key = F.col(f"cur.{key}").isNull()
    is_changed = F.col(f"upd.{key}").isNotNull() & ~is_new_key & changed_cond

    # current rows: closed if changed, kept if not (absent from updates ⇒ kept)
    kept_or_closed = joined.filter(F.col(f"cur.{key}").isNotNull()).select(
        F.col(f"cur.{key}").alias(key),
        *[F.col(f"cur.{t}").alias(t) for t in tracked],
        F.col("cur.valid_from").alias("valid_from"),
        F.when(is_changed, effective.cast("date"))
        .otherwise(F.col("cur.valid_to"))
        .alias("valid_to"),
        F.when(is_changed, F.lit(False)).otherwise(F.lit(True)).alias("is_current"),
    )
    # new open versions: changed keys + brand-new keys
    opened = joined.filter(is_changed | (is_new_key & F.col(f"upd.{key}").isNotNull())).select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{t}").alias(t) for t in tracked],
        effective.cast("date").alias("valid_from"),
        F.lit(end_of_time).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.select(
        key, *tracked, "valid_from", "valid_to", "is_current"
    ).unionByName(kept_or_closed).unionByName(opened)


def scd2_as_of(dim: DataFrame, key: str, as_of: Column) -> DataFrame:
    """Point-in-time view: the version of each key valid at ``as_of``
    (valid_from ≤ as_of < valid_to) — the dimension side of an as-of
    join against history."""
    return dim.filter(
        (F.col("valid_from") <= as_of.cast("date"))
        & (as_of.cast("date") < F.col("valid_to"))
    )
