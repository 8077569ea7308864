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


# 4-state Hilbert DFA over original (x_bit, y_bit) pairs, MSB->LSB:
# index = state*4 + 2*x_bit + y_bit. States are the 4 reachable frame
# transforms of the xy2d rotation group (identity, swap, swap+flip,
# flip); tables derived by simulating that group and verified
# bit-for-bit against the classic recipe (tests/test_r12_recounts.py).
_HILBERT_STATE_LUT = [1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2]
_HILBERT_DIGIT_LUT = [0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0]


def hilbert_index(x: Column, y: Column, bits: int) -> Column:
    """The Hilbert-curve index d ∈ [0, 4^bits) of two quantized
    non-negative ints in [0, 2^bits) — the locality-tighter sibling of
    ``morton_interleave``: consecutive d values are always ADJACENT
    grid cells (Morton jumps at tile seams), so equal-size curve
    segments have smaller bounding boxes on average, which is why
    lakehouse clustering (e.g. Delta's Liquid, BigQuery) moved from
    Z-order to Hilbert.

    Implementation note (a real blowup, measured): the textbook xy2d
    recipe mutates (x, y) every level, and the straight Column
    transliteration references the prior level's coordinates ~4× per
    step — a 4^bits Catalyst expression tree that cost ~22 s of
    analysis+codegen PER QUERY at bits=6 (flat across SFs: pure
    driver-side compile, not data). This form instead runs the
    equivalent 4-STATE DFA over the ORIGINAL bit pairs (MSB→LSB): the
    per-level quadrant digit and next state come from two 16-entry
    lookup tables indexed by ``state·4 + 2·x_bit + y_bit``, so each
    level references the prior state exactly ONCE (element_at) and the
    tree stays linear in ``bits``. The tables are derived mechanically
    from the xy2d rotation group (4 reachable transforms) and pinned
    against the classic recipe plus the adjacency property in tests.
    All integer shift/mask/element_at arithmetic — codegen, no UDF,
    same portability contract as the Morton key."""
    xc, yc = x.cast("bigint"), y.cast("bigint")
    state_lut = F.array(*[F.lit(v) for v in _HILBERT_STATE_LUT])
    digit_lut = F.array(*[F.lit(v).cast("bigint") for v in _HILBERT_DIGIT_LUT])
    st = F.lit(0)
    d = F.lit(0).cast("bigint")
    for i in range(bits - 1, -1, -1):
        inp = (
            F.lit(2) * F.shiftright(xc, i).bitwiseAND(F.lit(1))
            + F.shiftright(yc, i).bitwiseAND(F.lit(1))
        )
        idx = (st * 4 + inp + F.lit(1)).cast("int")  # 1-based element_at
        d = d * 4 + F.element_at(digit_lut, idx)
        st = F.element_at(state_lut, idx)
    return d


def hilbert_steps_sql(x: str, y: str, bits: int, src: str) -> str:
    """CTE chain ``h{bits-1} … h0`` replaying :func:`hilbert_index`
    step-for-step in DuckDB: each level carries (x, y, d) forward; the
    caller selects ``d`` (plus whatever payload columns ``src``
    provides — they pass through untouched). ``//`` + ``% 2`` matches
    Spark's shiftright/bitwiseAND on non-negative ints."""
    n = 1 << bits
    ctes = [f"h_in AS (SELECT *, {x} AS hx, {y} AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"]
    prev = "h_in"
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((hx // {s}) % 2)"
        ry = f"((hy // {s}) % 2)"
        step = f"""h{i} AS (
  SELECT * REPLACE (
    hd + {s} * {s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}) AS hd,
    CASE WHEN {ry} = 1 THEN hx
         WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END AS hx,
    CASE WHEN {ry} = 1 THEN hy
         WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END AS hy
  ) FROM {prev}
)"""
        ctes.append(step)
        prev = f"h{i}"
    return ",\n".join(ctes)
