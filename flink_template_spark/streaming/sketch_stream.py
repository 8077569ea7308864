"""Streaming KMV distinct-count sketches (mergeable-sketch changelog).

The streaming dual of operators.sketches_portable.kmv_*: each
micro-batch computes its OWN k-minimum-values sketch per cell (≤ k
rows) and appends it to an epoch-stamped changelog directory — the
same append-only/overwrite-by-epoch contract as streaming.rollup, so
at-least-once foreachBatch retries stay idempotent. Readers union the
changelog and ``kmv_merge`` it back to one sketch per cell.

Why this is exactly right for sketches: KMV union is LOSSLESS BY
VALUE (the k smallest of a union is a subset of each side's k
smallest — proven in tests/test_sketches), so the stream-maintained
sketch is BIT-IDENTICAL to the sketch a batch job would build over
all events ever seen. No approximation drift accumulates across
epochs, estimates (and their union/intersection algebra) keep their
oracle-exact arithmetic, and compaction is just kmv_merge of epochs
into a base — kilobytes per cell regardless of stream history.

Scale: per epoch the writer ships ≤ k rows per touched cell; reader
cost is (epochs × k) rows per cell until compaction. State lives in
the changelog, not the streaming agg, so no watermark bound is needed
for correctness (distinct-ness is order-insensitive).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.operators.sketches_portable import (
    KMV_K,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def write_kmv_stream(
    events: DataFrame,
    sketch_dir: str,
    checkpoint: str,
    cell_col: str = "event_type",
    item_col: str = "user_id",
    k: int = KMV_K,
    available_now: bool = False,
):
    """Start the sketch changelog writer: append mode; each epoch
    directory holds that micro-batch's per-cell KMV sketch rows."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        sk = kmv_sketch(batch_df, [cell_col], item_col, k=k)
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


def _read_optional(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # directory absent -> treat as empty


def read_kmv(
    spark: SparkSession,
    sketch_dir: str,
    cell_col: str = "event_type",
    k: int = KMV_K,
) -> DataFrame:
    """(cell, n_h, theta, est): merge base ∪ every changelog epoch and
    estimate — identical to the batch sketch over all events seen.
    Sketch union is idempotent and commutative, so base/changelog
    duplicates (a crash between compaction's write and delete) merge
    away instead of double-counting."""
    parts = [
        df.select(cell_col, "h")
        for df in (
            _read_optional(spark, os.path.join(sketch_dir, "base")),
            _read_optional(spark, os.path.join(sketch_dir, "changelog")),
        )
        if df is not None
    ]
    if not parts:
        raise FileNotFoundError(f"no KMV sketch data under {sketch_dir}")
    union = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    merged = kmv_merge(union, [cell_col], k=k)
    return kmv_estimate(merged, [cell_col], k=k)


def compact_kmv(spark: SparkSession, sketch_dir: str, cell_col: str = "event_type",
                k: int = KMV_K) -> None:
    """Fold base ∪ changelog into a new base snapshot OUTSIDE the
    epoch namespace (the streaming.rollup compaction discipline):
    kmv_merge IS the compaction — the merged sketch is the exact union
    state, so read amplification returns to k rows per cell.
    Write-then-delete ordering: the new base is fully in place before
    any changelog epoch is removed, so a crash mid-compaction leaves
    base/changelog duplicates that the reader's merge absorbs (union
    is idempotent) — never data loss. Keeping the base out of the
    epoch=N namespace also means a restarted stream whose checkpoint
    was lost (epoch ids reset to 0) can never overwrite compacted
    history."""
    import shutil

    parts = [
        df.select(cell_col, "h")
        for df in (
            _read_optional(spark, os.path.join(sketch_dir, "base")),
            _read_optional(spark, os.path.join(sketch_dir, "changelog")),
        )
        if df is not None
    ]
    if not parts:
        return
    union = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    merged = kmv_merge(union, [cell_col], k=k).localCheckpoint()
    tmp = os.path.join(sketch_dir, "base_new")
    merged.repartition(1).write.mode("overwrite").parquet(tmp)
    base = os.path.join(sketch_dir, "base")
    if os.path.exists(base):
        shutil.rmtree(base)
    os.rename(tmp, base)
    log = os.path.join(sketch_dir, "changelog")
    if os.path.exists(log):
        shutil.rmtree(log)
