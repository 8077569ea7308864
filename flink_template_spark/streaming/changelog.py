"""Counter-safe changelog state for NON-IDEMPOTENT mergeable state.

The generic machinery behind streaming.cms_stream (Count-Min counters)
and streaming.fingerprint_stream (XOR/SUM content fingerprints): each
micro-batch appends its own merged state rows under
``changelog/epoch=N``; readers fold exactly-once; compaction folds the
changelog into a base snapshot.

Set-semantics sketches (KMV) can read base ∪ base_old ∪ changelog at
every crash point because re-reading a superseded part merges away
(streaming.sketch_stream.union_parts). ADDITIVE state cannot — double-
reading double-counts — so this module implements the counter-safe
contract instead (designed in r6 after the CMS first draft had exactly
that double-count window):

- the compacted base carries a ``_folded_epochs.json`` sidecar naming
  the changelog epoch dirs whose state it contains (written INSIDE
  base_new before any rename, so it travels atomically with the base);
- readers take EXACTLY ONE base — ``base`` if present, else
  ``base_old`` (whenever both exist, base is by construction the
  superset fold) — plus every changelog epoch NOT named in that base's
  sidecar;
- compaction folds (chosen base ∪ unfolded epochs) into base_new with
  sidecar = (previous sidecar ∩ epochs still on disk) ∪ newly folded,
  renames base aside, renames base_new in, deletes exactly the
  sidecar-named epoch dirs, and drops base_old last.

Every crash point replays to the exact state (pinned by the CMS
crash-window tests, which exercise this shared machinery). Out of
scope, documented: a stream restarted WITHOUT its checkpoint re-ingests
its input under reset epoch ids — inherent re-count for any additive
changelog; Structured Streaming's exactly-once already requires the
checkpoint to survive.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_SIDECAR = "_folded_epochs.json"

# merge_fn: fold a union of state rows back to one canonical state table
MergeFn = Callable[[DataFrame], DataFrame]


def folded_epochs(base_dir: str) -> set[str]:
    sidecar = os.path.join(base_dir, _SIDECAR)
    if not os.path.exists(sidecar):
        return set()
    with open(sidecar) as fh:
        return set(json.load(fh)["epochs"])


def epoch_dirs(state_dir: str) -> dict[str, str]:
    """Extant changelog epoch dirs: name -> absolute path."""
    log = os.path.join(state_dir, "changelog")
    if not os.path.isdir(log):
        return {}
    return {
        name: os.path.join(log, name)
        for name in sorted(os.listdir(log))
        if name.startswith("epoch=")
        and os.path.isdir(os.path.join(log, name))
    }


def counter_state(
    spark: SparkSession, state_dir: str, cols: list[str]
) -> tuple[DataFrame | None, str | None, set[str], dict[str, str]]:
    """(state_union, chosen_base_dir, folded, unfolded_epochs) under the
    one-base + unfolded-epochs read rule."""
    parts: list[DataFrame] = []
    chosen = None
    for cand in ("base", "base_old"):
        d = os.path.join(state_dir, cand)
        if os.path.isdir(d):
            chosen = d
            parts.append(spark.read.parquet(d).select(*cols))
            break  # exactly one base — base supersedes base_old
    folded = folded_epochs(chosen) if chosen else set()
    epochs = {
        name: p
        for name, p in epoch_dirs(state_dir).items()
        if name not in folded
    }
    parts.extend(spark.read.parquet(p).select(*cols) for p in epochs.values())
    if not parts:
        return None, chosen, folded, epochs
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    return union, chosen, folded, epochs


def read_state(
    spark: SparkSession, state_dir: str, cols: list[str], merge: MergeFn
) -> DataFrame:
    """The exactly-once merged state over everything the stream has
    appended, at every crash point."""
    union, _, _, _ = counter_state(spark, state_dir, cols)
    if union is None:
        raise FileNotFoundError(f"no changelog state under {state_dir}")
    return merge(union)


def compact_state(
    spark: SparkSession, state_dir: str, cols: list[str], merge: MergeFn
) -> None:
    """Fold the chosen base ∪ unfolded epochs into a new base snapshot
    under the counter-safe sidecar contract (module docstring)."""
    union, chosen, folded, epochs = counter_state(spark, state_dir, cols)
    if union is None:
        return
    merged = merge(union).localCheckpoint()

    base = os.path.join(state_dir, "base")
    base_old = os.path.join(state_dir, "base_old")
    base_new = os.path.join(state_dir, "base_new")
    merged.repartition(1).write.mode("overwrite").parquet(base_new)
    # sidecar: keep prior names only while their dirs still exist (a
    # completed earlier swap already deleted them), add what we folded
    now_folded = sorted((folded & set(epoch_dirs(state_dir))) | set(epochs))
    tmp = os.path.join(base_new, _SIDECAR + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"epochs": now_folded}, fh)
    os.replace(tmp, os.path.join(base_new, _SIDECAR))

    # A stale base_old is superseded by base (and both by merged);
    # clear it so the rename-aside cannot collide. base_old must NOT be
    # touched when base is absent (healing path) — it is the only copy.
    if os.path.isdir(base_old) and os.path.isdir(base):
        shutil.rmtree(base_old)
    if os.path.isdir(base):
        os.rename(base, base_old)
    os.rename(base_new, base)
    for name in now_folded:
        p = os.path.join(state_dir, "changelog", name)
        if os.path.isdir(p):
            shutil.rmtree(p)
    log = os.path.join(state_dir, "changelog")
    if os.path.isdir(log) and not os.listdir(log):
        os.rmdir(log)  # fully folded — tidy the empty namespace
    if os.path.isdir(base_old):
        shutil.rmtree(base_old)
