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

Crash-safety differs from the KMV changelog ON PURPOSE. KMV rows are
distinct hashes — set semantics — so re-reading a superseded part
(base_old, an already-folded epoch) is harmless and union_parts'
read-everything rule is correct there. Counter ADDITION is not
idempotent: a crash between "base_new renamed into place" and
"changelog deleted" would double-count every folded epoch if the
reader unioned base with the whole changelog (r6 self-review — the
first draft of this module had exactly that window). The counter-safe
contract used here:

- the compacted base carries a sidecar ``_folded_epochs.json`` naming
  the changelog epoch dirs whose counts it contains (written INSIDE
  base_new before any rename, so it travels atomically with the base);
- readers take EXACTLY ONE base — ``base`` if present, else
  ``base_old`` (whenever both exist, base is by construction the
  superset fold) — plus every changelog epoch NOT named in that base's
  sidecar;
- compaction folds (chosen base ∪ unfolded epochs) into base_new with
  sidecar = (previous sidecar ∩ epochs still on disk) ∪ newly folded,
  then renames base aside, renames base_new in, deletes exactly the
  sidecar-named epoch dirs, and drops base_old last.

Every crash point replays to the exact counter state. Out of scope,
documented: a stream restarted WITHOUT its checkpoint re-ingests its
input under reset epoch ids — inherent re-count for any counter
changelog (the data itself is reprocessed); Structured Streaming's
exactly-once already requires the checkpoint to survive.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from flink_template_spark.operators.sketches_portable import (
    cms_counters,
    cms_lookup,
    cms_merge,
)

_COLS = ["i", "pos", "cnt"]
_SIDECAR = "_folded_epochs.json"


def write_cms_stream(
    events: DataFrame,
    sketch_dir: str,
    checkpoint: str,
    item_expr: str = "user_id",
    available_now: bool = False,
):
    """Start the counter changelog writer: append mode; each epoch
    directory holds that micro-batch's merged counter rows.
    Overwrite-by-epoch keeps a foreachBatch retry idempotent."""

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


def _folded_epochs(base_dir: str) -> set[str]:
    sidecar = os.path.join(base_dir, _SIDECAR)
    if not os.path.exists(sidecar):
        return set()
    with open(sidecar) as fh:
        return set(json.load(fh)["epochs"])


def _epoch_dirs(sketch_dir: str) -> dict[str, str]:
    """Extant changelog epoch dirs: name -> absolute path."""
    log = os.path.join(sketch_dir, "changelog")
    if not os.path.isdir(log):
        return {}
    return {
        name: os.path.join(log, name)
        for name in sorted(os.listdir(log))
        if name.startswith("epoch=")
        and os.path.isdir(os.path.join(log, name))
    }


def _counter_state(
    spark: SparkSession, sketch_dir: str
) -> tuple[DataFrame | None, str | None, set[str], dict[str, str]]:
    """(state, chosen_base_dir, folded, unfolded_epochs): the exact
    counter table under the one-base + unfolded-epochs read rule."""
    parts: list[DataFrame] = []
    chosen = None
    for cand in ("base", "base_old"):
        d = os.path.join(sketch_dir, cand)
        if os.path.isdir(d):
            chosen = d
            parts.append(spark.read.parquet(d).select(*_COLS))
            break  # exactly one base — base supersedes base_old
    folded = _folded_epochs(chosen) if chosen else set()
    epochs = {
        name: p
        for name, p in _epoch_dirs(sketch_dir).items()
        if name not in folded
    }
    parts.extend(
        spark.read.parquet(p).select(*_COLS) for p in epochs.values()
    )
    if not parts:
        return None, chosen, folded, epochs
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    return union, chosen, folded, epochs


def read_cms(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The merged (i, pos, cnt) counter table over everything seen —
    identical to the batch sketch (counter addition commutes; the
    one-base + unfolded-epochs rule guarantees each count enters the
    sum exactly once at every crash point)."""
    union, _, _, _ = _counter_state(spark, sketch_dir)
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
    """Fold the chosen base ∪ unfolded epochs into a new base snapshot:
    cms_merge IS the compaction, read amplification returns to ≤ d·w
    rows. The swap follows the counter-safe sidecar contract in the
    module docstring — at every crash point the read rule reproduces
    the exact counter state (pinned by the crash-window test)."""
    union, chosen, folded, epochs = _counter_state(spark, sketch_dir)
    if union is None:
        return
    merged = cms_merge(union, []).localCheckpoint()

    base = os.path.join(sketch_dir, "base")
    base_old = os.path.join(sketch_dir, "base_old")
    base_new = os.path.join(sketch_dir, "base_new")
    if os.path.isdir(base_new):
        shutil.rmtree(base_new)  # partial write from a prior crash
    merged.repartition(1).write.mode("overwrite").parquet(base_new)
    # sidecar: keep prior names only while their dirs still exist (a
    # completed earlier swap already deleted them), add what we folded
    now_folded = sorted((folded & set(_epoch_dirs(sketch_dir))) | set(epochs))
    tmp = os.path.join(base_new, _SIDECAR + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"epochs": now_folded}, fh)
    os.replace(tmp, os.path.join(base_new, _SIDECAR))

    # A stale base_old is superseded by base (and both are superseded
    # by merged); clear it so the rename-aside cannot collide.
    if os.path.isdir(base_old) and os.path.isdir(base):
        shutil.rmtree(base_old)
    if os.path.isdir(base):
        os.rename(base, base_old)
    os.rename(base_new, base)
    for name in now_folded:
        p = os.path.join(sketch_dir, "changelog", name)
        if os.path.isdir(p):
            shutil.rmtree(p)
    log = os.path.join(sketch_dir, "changelog")
    if os.path.isdir(log) and not os.listdir(log):
        os.rmdir(log)  # fully folded — tidy the empty namespace
    if os.path.isdir(base_old):
        shutil.rmtree(base_old)
