"""Central registry mapping query name → (Spark callable, DuckDB oracle SQL).

Contract (driver's __spark_entry__.py):
- the Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle SQL is ANSI SQL DuckDB can run on the same parquet tables
  (views: region nation customer supplier part orders lineitem events
  documents embeddings);
- output column NAMES and VALUES must match bit-for-bit — the driver sorts
  columns by name and hashes values.

Numeric discipline for hash-stable cross-engine results:
- money/quantity aggregates: cast inputs to DECIMAL, aggregate exactly,
  CAST the final result to DOUBLE (exact decimal → double conversion is
  correctly rounded and identical in both engines);
- averages: exact decimal SUM cast to double, divided by the count — both
  engines then perform the same IEEE double division;
- trig / irrational results: round to a tolerance far above libm ulp
  differences (documented per query).

Execution contract: QUERIES[name](spark, sf_dir) is *usually* a pure
lazy plan builder, but a few entries run bounded Spark jobs at
CONSTRUCTION time (ADVICE r4): iterative trainers collect k-row
centroid/merge batches (kmeans/PQ/BPE), and the ANN serve path
materializes the session's index on first touch and collects its ≤50-row
shortlist to push an In(vec_id) filter into the vector scan
(plans/vectors.py ann_index / q_ann_multiprobe_rerank). Explain-only
tooling must therefore tolerate job execution (and transient failures
surfacing) inside QUERIES[name]() itself, not just at action time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a Spark query (and optionally its oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
