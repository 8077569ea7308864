"""Deterministic cross-engine hashing primitives.

Both Spark and DuckDB expose md5; neither shares a native integer hash
(Spark ``hash`` is murmur3-32, DuckDB ``hash`` is its own 64-bit).  We
therefore define one portable primitive — the first 8 hex chars of md5
parsed as a bigint (32-bit range, no overflow) — and build MinHash /
SimHash on top of it with identical integer arithmetic in both dialects.
This makes the sketches *oracle-checkable*, not just rows-only.

MinHash family: h_i(x) = (a_i * (x mod P) + b_i) mod P with
P = 2^31 - 1 (Mersenne prime). a_i*(x mod P) < 2^62 — no int64 overflow.
Constants are derived from a fixed seed so engine and oracle agree.
"""

from __future__ import annotations

import random

MERSENNE_P = (1 << 31) - 1
NUM_HASHES = 16
LSH_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // LSH_BANDS

_rng = random.Random(420_042)
MINHASH_A = [_rng.randrange(1, MERSENNE_P) for _ in range(NUM_HASHES)]
MINHASH_B = [_rng.randrange(0, MERSENNE_P) for _ in range(NUM_HASHES)]


def md5int_spark(expr: str, bits: int = 32) -> str:
    """Spark SQL: ``bits``-bit integer from the md5 prefix (bigint-typed).

    bits must be a multiple of 4 and ≤ 60 (15 hex chars) so the value
    always fits a signed int64 in both engines."""
    if bits % 4 or bits > 60:
        raise ValueError("bits must be a multiple of 4, at most 60")
    return f"CAST(conv(substr(md5({expr}), 1, {bits // 4}), 16, 10) AS BIGINT)"


def md5int_duckdb(expr: str, bits: int = 32) -> str:
    """DuckDB SQL: the same ``bits``-bit integer from the md5 prefix."""
    if bits % 4 or bits > 60:
        raise ValueError("bits must be a multiple of 4, at most 60")
    return f"CAST('0x' || substr(md5({expr}), 1, {bits // 4}) AS BIGINT)"


def minhash_expr(i: int, x: str) -> str:
    """Dialect-neutral h_i over an integer-typed SQL expression ``x``."""
    return f"(({MINHASH_A[i]} * (({x}) % {MERSENNE_P}) + {MINHASH_B[i]}) % {MERSENNE_P})"
