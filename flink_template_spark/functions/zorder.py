"""Z-order (Morton) interleaving for multi-dimensional data layout.

The 100 TB problem this solves: parquet min/max skipping only prunes on
columns the file layout is sorted by. Sorting by ONE column makes every
other column's per-file ranges full-width; interleaving the bits of two
quantized columns and range-partitioning by the interleaved key gives
every file a tight bounding BOX — point/range predicates on EITHER
dimension skip ~sqrt-fraction of files instead of none (the Delta Lake
/ lakehouse Z-ORDER technique, here as a first-class deterministic
expression). Writing the layout is then just
``df.repartitionByRange(N, zkey).sortWithinPartitions(zkey).write``.

Alignment property (tested): the top 2d bits of a 2×``bits`` Morton key
select an aligned 2^(bits-d) × 2^(bits-d) tile, so a partitioning on
the top bits yields EXACT tiles, not just statistically tight boxes.

Everything is integer shift/mask arithmetic on already-quantized
non-negative ints — bit-identical in Spark and DuckDB, so layouts (and
the skipping bounds derived from them) are oracle-checkable and
reproducible across engines/backfills, the same portability contract
as functions.hashing. Quantization belongs to the caller and must use
``floor`` (NOT a bare CAST: DuckDB casts double→int by ROUNDING,
Spark by truncation — the one cross-engine trap in this file's
domain)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int) -> Column:
    """The 2*bits-bit Morton key of two quantized non-negative ints in
    [0, 2^bits): x occupies even bit positions, y odd. Unrolls to
    ``bits`` shift/mask terms per dimension — all JVM-side codegen, no
    UDF."""
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i))
            + F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return key


def morton_interleave_sql(x: str, y: str, bits: int) -> str:
    """DuckDB fragment computing the identical key (integer div/mod —
    `//` matches Spark shiftright for non-negative ints)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
