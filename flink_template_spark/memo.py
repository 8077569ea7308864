"""Session-lifetime LRU memo for materialized (persisted) DataFrames.

Factored out of plans/vectors.py's ann_index cache (VERDICT r5 next #2)
so the same discipline serves every "build once per (session, sf_dir),
serve many" artifact — the IVF-PQ serving index and the derived
trade-edge graph table today. At 100 TB each of these is the parquet
artifact an offline build job writes once and every downstream query
reads; in a long-lived local session the memo plays that role.

Concurrency/bound contract (carried verbatim from the ann_index
reviews, ADVICE r4+r5):

- A PER-KEY lock serializes concurrent first builds of the SAME key
  (two threads would otherwise both build and leave one orphaned
  persisted artifact pinned in executor storage) without serializing
  independent keys behind one multi-job build; the global lock only
  guards the tiny dict operations.
- The size bound evicts STOPPED-session entries first — their keys can
  never be hit again — judged by the cached entry's own SparkContext
  liveness, not by whose applicationId is inserting (a second live
  session in the same process must not get its artifact silently
  unpersisted just for being foreign). Evicting a live-session entry
  degrades "serve from materialized" to full recompute, so when it's
  unavoidable we warn — AFTER the pop/unpersist, so a
  warnings-as-errors run still leaves the cache within its bound.
- Per-key locks are popped with their entries AND on failed builds, so
  the lock dict stays as bounded as the cache itself.
- Entries may be persist()-backed (ann_index, phrase postings) or
  localCheckpoint()-backed (trade edges, near-dup components — chosen
  when consumers re-reference the table enough that lineage re-planning
  dominates, see plans/graph.py). Eviction's unpersist(True) frees
  cache-manager storage for the former; for the latter it is a no-op
  and the checkpoint RDD blocks are reclaimed when the evicted
  DataFrame loses its last reference and the JVM GCs it — the same
  GC-scoped trade operators/rank_global.py documents for its lazy
  checkpoints. Eviction therefore always unlinks the entry; only the
  reclamation mechanism differs (r8 self-review).
"""

from __future__ import annotations

import threading
import warnings
from collections import OrderedDict
from typing import Any, Callable


class SessionLRUMemo:
    """LRU memo of persisted per-session build artifacts.

    ``entry_df`` extracts the persisted DataFrame from a cached entry
    (identity for plain-DataFrame entries; a tuple index for composite
    entries like ann_index's (centroids, codebooks, index)).
    """

    def __init__(
        self,
        name: str,
        max_entries: int,
        entry_df: Callable[[Any], Any] = lambda e: e,
    ) -> None:
        self.name = name
        self.max_entries = max_entries
        self._entry_df = entry_df
        self.cache: "OrderedDict[Any, Any]" = OrderedDict()
        self.lock = threading.Lock()
        # key -> [lock, waiter_refcount] holder (see get_or_build)
        self.key_locks: dict[Any, list] = {}

    def _entry_stopped(self, entry: Any) -> bool:
        """True when the session that built this entry is stopped (its
        artifact can never be served again)."""
        try:
            sc = self._entry_df(entry).sparkSession.sparkContext
            return sc._jsc is None or sc._jsc.sc().isStopped()
        except Exception:
            return True

    def _unpersist_entry(self, entry: Any) -> None:
        try:
            self._entry_df(entry).unpersist(True)
        except Exception:
            pass  # owning session already stopped

    def evict_locked(self) -> None:
        """Evict past the size bound (caller holds self.lock):
        stopped-session entries oldest-first, then — with a post-pop
        warning — the oldest live entry."""
        while len(self.cache) > self.max_entries:
            # one liveness probe per entry (it's a py4j round-trip held
            # under the global lock): carry the scan's verdict to the
            # post-pop warning instead of re-probing the victim
            victim, stopped = next(
                (
                    (k, True)
                    for k, v in self.cache.items()
                    if self._entry_stopped(v)
                ),
                (next(iter(self.cache)), False),
            )
            entry = self.cache.pop(victim)
            self._retire_lock_locked(victim)
            self._unpersist_entry(entry)
            if not stopped:
                warnings.warn(
                    f"{self.name} cache evicted LIVE-session entry"
                    f" {victim!r}; subsequent serves for it will rebuild"
                    " (raise max_entries if the process genuinely needs"
                    f" more than {self.max_entries} live entries)",
                    stacklevel=3,
                )

    def evict(self, key: Any) -> None:
        """Drop one key (and unpersist its artifact) if present — used
        by the bench to force a true cold build per timed sample."""
        with self.lock:
            entry = self.cache.pop(key, None)
            self._retire_lock_locked(key)
        if entry is not None:
            self._unpersist_entry(entry)

    def _retire_lock_locked(self, key: Any) -> None:
        """Drop ``key``'s lock holder ONLY when no thread is queued on
        it (caller holds self.lock). Popping a holder with live waiters
        re-opens the concurrent-rebuild race the refcount exists to
        close: the waiter proceeds under the old lock while a fresh
        arrival setdefaults a new one, and the second insert unpersists
        an entry the first caller is already using (r6 review, second
        pass). A holder left behind here is retired by get_or_build's
        finally block once its last waiter drains."""
        h = self.key_locks.get(key)
        if h is not None and h[1] <= 0:
            self.key_locks.pop(key, None)

    def get_or_build(self, key: Any, build: Callable[[], Any]) -> Any:
        """Return the cached entry for ``key``, building it (via
        ``build()``, which must persist+materialize what entry_df
        returns) at most once per key across concurrent callers."""
        with self.lock:
            hit = self.cache.get(key)
            if hit is not None:
                self.cache.move_to_end(key)
                return hit
            # Per-key locks are REFCOUNTED: a failed build may only
            # retire the lock when no other thread is still queued on
            # that same lock object. Popping it eagerly (the first
            # ADVICE-r5 fix) let a queued waiter and a fresh arrival —
            # which setdefault would hand a NEW lock — build the same
            # key concurrently, and the second insert unpersisted an
            # entry the first caller was already using (r6 review).
            holder = self.key_locks.setdefault(key, [threading.Lock(), 0])
            holder[1] += 1
            key_lock = holder[0]

        # Build outside the global lock (a multi-job Spark build must
        # not serialize unrelated keys); the per-key lock + double-check
        # makes concurrent same-key callers share one build.
        try:
            with key_lock:
                with self.lock:
                    hit = self.cache.get(key)
                    if hit is not None:
                        self.cache.move_to_end(key)
                        return hit
                entry = build()
                with self.lock:
                    stale = self.cache.get(key)
                    if stale is not None:
                        # only reachable if this key's lock was
                        # evicted+recreated mid-build; don't orphan the
                        # racing build's persist
                        self._unpersist_entry(stale)
                    self.cache[key] = entry
                    self.evict_locked()
                return entry
        finally:
            with self.lock:
                h = self.key_locks.get(key)
                if h is not None and h[0] is key_lock:
                    h[1] -= 1
                    # retire failed keys' locks only once idle (no
                    # waiters) and nothing cached — bounded without the
                    # concurrent-rebuild race (cached keys keep their
                    # lock until eviction pops it)
                    if h[1] <= 0 and key not in self.cache:
                        self.key_locks.pop(key, None)
