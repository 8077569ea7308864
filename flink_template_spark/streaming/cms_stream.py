"""Streaming Count-Min frequency sketches (heavy-hitter maintenance).

The frequency dual of streaming.sketch_stream's KMV changelog: each
micro-batch computes its OWN CMS counter table per cell
(≤ d·w = 4096 rows per touched cell, operators.sketches_portable) and
appends it epoch-stamped; readers union the changelog and SUM-merge.

Why this is exactly right for CMS: counter union IS addition — sums
commute and associate, so the stream-maintained sketch is BIT-IDENTICAL
to the sketch a batch job would build over all events ever seen, and
point estimates (min over the d rows) carry the same one-sided error
bound with zero drift across epochs. Compaction is cms_merge of epochs
back into a base of ≤ d·w rows per cell. Heavy-hitter queries
(estimate counts for a candidate key set) read kilobytes regardless of
stream history.

Crash-safety is the shared sketch-changelog contract
(sketch_stream.union_parts / swap_base): overwrite-by-epoch writes are
retry-idempotent, and every compaction crash point leaves the full
state readable — duplicates are impossible because the reader never
unions base WITH base_new, and base_old only exists while base is
absent or superseded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_template_spark.operators.sketches_portable import (
    cms_counters,
    cms_lookup,
    cms_merge,
)
from flink_template_spark.streaming.sketch_stream import swap_base, union_parts

_COLS = ["i", "pos", "cnt"]


def write_cms_stream(
    events: DataFrame,
    sketch_dir: str,
    checkpoint: str,
    item_expr: str = "user_id",
    available_now: bool = False,
):
    """Start the counter changelog writer: append mode; each epoch
    directory holds that micro-batch's merged counter rows."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        sk = cms_counters(batch_df, [], item_expr)
        (
            sk.repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(sketch_dir, "changelog", f"epoch={epoch_id}"))
        )

    writer = (
        events.writeStream.outputMode("append")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The merged (i, pos, cnt) counter table over everything seen —
    identical to the batch sketch (counter addition commutes)."""
    union = union_parts(spark, sketch_dir, _COLS)
    if union is None:
        raise FileNotFoundError(f"no CMS sketch data under {sketch_dir}")
    return cms_merge(union, [])


def estimate_counts(
    spark: SparkSession, sketch_dir: str, keys: DataFrame, key_expr: str
) -> DataFrame:
    """Point estimates for ``keys`` against the stream-maintained
    sketch (min over d rows; ≥ true count, the CMS bound)."""
    return cms_lookup(read_cms(spark, sketch_dir), keys, key_expr)


def compact_cms(spark: SparkSession, sketch_dir: str) -> None:
    """Fold base ∪ base_old ∪ changelog into a new base snapshot:
    cms_merge IS the compaction, read amplification returns to ≤ d·w
    rows; the swap is the shared crash-recoverable rename dance."""
    union = union_parts(spark, sketch_dir, _COLS)
    if union is None:
        return
    merged = cms_merge(union, []).localCheckpoint()
    swap_base(sketch_dir, merged)
