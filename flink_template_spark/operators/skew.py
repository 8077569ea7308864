"""Skew-aware join utilities for 100 TB-scale shuffles.

Spark's AQE skew-join splitting (enabled in the session factory) handles
most skew at runtime, but it only splits *shuffle* partitions of
sort-merge joins. Two cases still need explicit handling:

- ``salted_join``: N-way key salting for a shuffle join where one side
  has pathological hot keys (e.g. a null-heavy or power-law foreign
  key). The hot side gets a random salt in [0, n); the other side is
  replicated n× with every salt value, so each hot key spreads over n
  reducers. Replication is bounded: only the *smaller* side is
  exploded, and n is a small constant — cost n·|small|, win = hot-key
  parallelism n×.
- ``key_histogram``: the diagnostic — per-key counts + share of total,
  for deciding whether salting / AQE thresholds are warranted.

Both are pure DataFrame transforms (no collect); `rand` salting uses a
fixed seed per call for reproducible tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Top-N hottest keys with their share of all rows."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            key,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy(F.desc("n_rows"), key)
        .limit(top)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` (hot-keyed, large) with ``other`` (smaller) on
    ``on``, spreading each key over ``n_salts`` reducers.

    The result has the same columns as a plain ``skewed.join(other,
    on, how)``. Only inner/left joins make sense here (the replicated
    side must not produce unmatched duplicates)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted = skewed.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
