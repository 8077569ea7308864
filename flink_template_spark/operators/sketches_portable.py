"""Engine-portable HyperLogLog — a mergeable distinct-count sketch whose
every step is deterministic integer/double arithmetic reproducible in
DuckDB SQL, making the sketch ORACLE-EXACT (unlike native
datasketches/approx_count_distinct, whose registers are
engine-internal — see q_hll_mergeable_rollup for that path).

Construction (classic HLL, p=8 → m=256 registers):

- 60-bit portable hash (functions.hashing.md5int_*: md5-prefix integer,
  identical in both dialects);
- bucket = h % m (low p bits), v = h // m (w = 52 remaining bits);
- rank = leading-zeros-of-v-in-w-bits + 1 = 53 - bitlen(v), with
  bitlen via ``length(bin(v))`` — an INTEGER-exact floor(log2)+1 in
  both engines (no float log);
- register value = max rank per bucket — a plain groupBy max, so the
  sketch is mergeable by construction: union of sets ≡ element-wise
  max of registers. Rolling up a finer grain to a coarser one is
  another max-aggregate over kilobytes, never a re-scan of rows;
- harmonic estimate with an exact-integer inner sum: each register
  contributes 2^-r, summed as 2^(53-r) BIGINTs (≤ m·2^53 < 2^62 — no
  overflow, exact in any order) and divided back by 2^53 only at the
  end; the empty-register and linear-counting small-range corrections
  use only exact integers and one libm ``ln`` absorbed by the final
  rounding.

Scale shape: one shuffle to (cell, bucket) — at most m rows per cell
regardless of input size — then per-cell folds. The 100 TB pattern:
materialize per-bucket registers once, answer any coarser rollup by
max-merging 256-int registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from flink_template_spark.functions.hashing import md5int_duckdb, md5int_spark

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_W = 60 - HLL_P  # 52 value bits
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^53, precomputed in Python so BOTH engines divide the
# same double literal by the exact integer register sum
ALPHA_M2_P53 = _ALPHA * HLL_M * HLL_M * float(1 << 53)
_LINEAR_THRESHOLD = 2.5 * HLL_M


def hll_registers(
    df: DataFrame, cell_cols: list[str], item_col: str
) -> DataFrame:
    """(cell_cols..., bucket, r): the sketch registers per cell. At most
    HLL_M rows per cell; map-side combined before the shuffle.

    NULL items are dropped (COUNT DISTINCT semantics): md5(NULL) would
    otherwise produce a phantom NULL-bucket register that inflates the
    estimate — identically in both engines, so the oracle could never
    catch it."""
    hashed = df.filter(F.col(item_col).isNotNull()).select(
        *cell_cols,
        F.expr(md5int_spark(f"CAST({item_col} AS STRING)", bits=60)).alias("__h"),
    )
    # integer `div`, NOT double division: h has up to 60 significant
    # bits, beyond a double's 53-bit mantissa — floor(h/m) in doubles
    # can be off by one
    v = F.expr(f"__h div {HLL_M}")
    rank = (
        F.when(v == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(v)))
        .alias("rank")
    )
    return (
        hashed.select(
            *cell_cols, F.pmod(F.col("__h"), F.lit(HLL_M)).alias("bucket"), rank
        )
        .groupBy(*cell_cols, "bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_merge(registers: DataFrame, to_cols: list[str]) -> DataFrame:
    """Roll registers up to a coarser grain: element-wise max ≡ sketch
    union (exact, not approximate — merging loses nothing)."""
    return registers.groupBy(*to_cols, "bucket").agg(F.max("r").alias("r"))


def hll_estimate(registers: DataFrame, cell_cols: list[str]) -> DataFrame:
    """(cell_cols..., approx_distinct): the HLL harmonic-mean estimate
    with linear-counting small-range correction, rounded to 2 dp (the
    one libm ``ln`` is the only cross-engine ulp source)."""
    # dynamic shift count needs the SQL form (the pyspark wrapper only
    # takes a literal numBits) — same note as operators.bloom
    shifted = F.expr(f"shiftleft(1L, CAST({HLL_W + 1} - r AS INT))")
    stats = registers.groupBy(*cell_cols).agg(
        F.sum(shifted).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s_int = F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(
        1 << (HLL_W + 1)
    )
    zeros = (F.lit(HLL_M) - F.col("n_present")).cast("double")
    e_raw = F.lit(ALPHA_M2_P53) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(_LINEAR_THRESHOLD)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(e_raw)
    return stats.select(*cell_cols, F.round(est, 2).alias("approx_distinct"))


# --- DuckDB oracle fragments (same math, same literals) -------------------


def hll_registers_sql(table: str, cell_cols: list[str], item_col: str) -> str:
    cells = ", ".join(cell_cols)
    h = md5int_duckdb(f"CAST({item_col} AS VARCHAR)", bits=60)
    return f"""
  SELECT {cells}, bucket, MAX(rank) AS r FROM (
    SELECT {cells},
      ({h}) % {HLL_M} AS bucket,
      CASE WHEN ({h}) // {HLL_M} = 0 THEN {HLL_W + 1}
           ELSE {HLL_W + 1} - length(bin(({h}) // {HLL_M})) END AS rank
    FROM {table} WHERE {item_col} IS NOT NULL
  ) GROUP BY {cells}, bucket
"""


def hll_estimate_sql(regs_cte: str, cell_cols: list[str]) -> str:
    cells = ", ".join(cell_cols)
    return f"""
  SELECT {cells},
    ROUND(CASE WHEN ({ALPHA_M2_P53!r} / CAST(s_int AS DOUBLE)) <= {_LINEAR_THRESHOLD!r}
                AND zeros > 0
           THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
           ELSE {ALPHA_M2_P53!r} / CAST(s_int AS DOUBLE) END, 2) AS approx_distinct
  FROM (
    SELECT {cells},
      CAST(SUM(CAST(1 AS BIGINT) << ({HLL_W + 1} - r)) AS BIGINT)
        + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {HLL_W + 1}) AS s_int,
      CAST({HLL_M} - COUNT(*) AS DOUBLE) AS zeros
    FROM {regs_cte} GROUP BY {cells}
  )
"""

# --- Count-Min sketch (frequency twin of the HLL above) -------------------
#
# d hash rows x w counters; updates and merges are plain integer SUMs
# (merge = counter addition = lossless union), point estimates are the
# min over the d rows — never an underestimate, overestimate bounded by
# collisions. Every step is integer arithmetic on the portable
# md5 + Mersenne-affine hashes (functions.hashing.minhash_expr), so the
# whole sketch — build, merge, lookup — is oracle-exact, with no float
# anywhere. Scale shape mirrors HLL: the build shuffles at most d·w
# counter rows per cell (map-side combined), and any coarser rollup is
# a SUM over kilobytes.

CMS_D = 4  # hash rows (reuses the first d MinHash affine constants)
CMS_W = 1024  # counters per row


def _cms_pos_spark(i: int, item_expr: str) -> str:
    from flink_template_spark.functions.hashing import minhash_expr

    x = md5int_spark(item_expr)
    return f"({minhash_expr(i, x)}) % {CMS_W}"


def _cms_pos_duckdb(i: int, item_expr: str) -> str:
    from flink_template_spark.functions.hashing import minhash_expr

    x = md5int_duckdb(item_expr)
    return f"({minhash_expr(i, x)}) % {CMS_W}"


def cms_counters(
    df: DataFrame, cell_cols: list[str], item_expr: str
) -> DataFrame:
    """(cell_cols..., i, pos, cnt): the sketch counters per cell.
    ``item_expr`` is a Spark SQL string expression for the keyed item
    (e.g. a column name). One shuffle of ≤ d·w rows per cell.
    NULL items are dropped (same discipline as hll_registers)."""
    rows = df.filter(F.expr(item_expr).isNotNull()).select(
        *cell_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_cms_pos_spark(i, item_expr)).alias("pos"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("h"),
    )
    return (
        rows.select(*cell_cols, F.col("h.i").alias("i"), F.col("h.pos").alias("pos"))
        .groupBy(*cell_cols, "i", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(counters: DataFrame, to_cols: list[str]) -> DataFrame:
    """Roll counters to a coarser grain: SUM ≡ sketch union (exact)."""
    return counters.groupBy(*to_cols, "i", "pos").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    counters: DataFrame, keys: DataFrame, key_expr: str
) -> DataFrame:
    """Point estimates for every row of ``keys``: min over the d rows'
    counters at the key's positions. Join is on (i, pos) — the keys side
    explodes to d rows, the counter side is already ≤ d·w rows (a
    broadcastable sketch).

    LEFT join + coalesce-to-0: the counters table is sparse (only
    touched cells have rows), and an absent cell means counter value 0.
    A key with ANY empty cell was never inserted, so its CMS estimate
    is exactly 0 — an inner join would instead drop unseen keys
    entirely and take the min over fewer than d rows for
    partially-colliding ones, breaking the d-row error bound."""
    # The (i, pos) join is only correct against a MERGED (cell-less)
    # counter table; per-cell counters would silently cross-match cells
    # and inflate every estimate (ADVICE r3) — fail loudly instead.
    if set(counters.columns) != {"i", "pos", "cnt"}:
        raise ValueError(
            "cms_lookup requires merged counters with exactly columns "
            f"{{i, pos, cnt}}; got {sorted(counters.columns)} — roll "
            "per-cell counters up with cms_merge(counters, []) first"
        )
    probed = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_cms_pos_spark(i, key_expr)).alias("pos"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("h"),
    ).select("*", F.col("h.i").alias("i"), F.col("h.pos").alias("pos")).drop("h")
    key_cols = [c for c in keys.columns]
    return (
        probed.join(F.broadcast(counters), ["i", "pos"], "left")
        .groupBy(*key_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_counters_sql(table: str, cell_cols: list[str], item_expr: str) -> str:
    cells = ", ".join(cell_cols) + ", " if cell_cols else ""
    branches = "\n  UNION ALL\n".join(
        f"  SELECT {cells}{i} AS i, {_cms_pos_duckdb(i, item_expr)} AS pos "
        f"FROM {table} WHERE {item_expr} IS NOT NULL"
        for i in range(CMS_D)
    )
    group = ", ".join(cell_cols + ["i", "pos"])
    return f"""
  SELECT {group}, COUNT(*) AS cnt FROM (
{branches}
  ) GROUP BY {group}
"""

# --- KMV / theta sketch (distinct counting WITH set operations) -----------
#
# The k-minimum-values sketch (Bar-Yossef et al. '02; the theta-sketch
# formulation of Dasgupta et al. '16): keep the k smallest distinct
# 32-bit portable hash values per cell. theta = the k-th smallest value
# (the full range when fewer than k were seen), retained = hashes
# strictly below theta, and any set S estimates as
# |retained| * 2^32 / theta. What HLL cannot do and KMV can: set
# INTERSECTION — two sketches intersect by counting common retained
# hashes below min(theta_a, theta_b), which HLL's register maxes
# destroy. Union stays closed too: the k smallest of the merged value
# sets is a valid KMV of the union (each side kept ITS k smallest, and
# the union's k smallest is a subset of the two kept sets).
#
# Oracle-exactness: the hash is functions.hashing.md5int (identical in
# both dialects), selection is integer ranking, and the only float op
# is ONE correctly-rounded IEEE division of exact-integer operands
# ((k-1)*2^32 and cnt*2^32 are < 2^39, theta < 2^33 — all exact
# doubles), so estimates carry ZERO rounding, like the priority-sample
# keys. Scale shape: the one real shuffle is the distinct over
# (cell, h); the k-smallest selection is two-level (top-k per
# (cell, h%32) sub-bucket first, then top-k of the ≤ 32k survivors) so
# no single task ever ranks a celebrity cell's full distinct stream.
# After that every sketch is ≤ k rows — unions, intersections, and
# rollups are joins over kilobytes. 32-bit hashes keep every estimate
# division exact; widen via md5int(bits=60) if ~2^16 distinct-per-cell
# collision rates matter (the casts stay deterministic cross-engine,
# the doubles merely stop being exact integers).

KMV_K = 64
KMV_RANGE = 1 << 32
_KMV_SUBBUCKETS = 32
# (k-1) * 2^32 — an exact double literal both engines divide by theta
KMV_NUM = float((KMV_K - 1) * KMV_RANGE)


def kmv_sketch(
    df: DataFrame, cell_cols: list[str], item_col: str, k: int = KMV_K
) -> DataFrame:
    """(cell_cols..., h): the k smallest distinct portable hashes per
    cell. NULL items are dropped (COUNT DISTINCT semantics, same
    discipline as hll_registers)."""
    hashed = (
        df.filter(F.col(item_col).isNotNull())
        .select(
            *cell_cols,
            F.expr(md5int_spark(f"CAST({item_col} AS STRING)")).alias("h"),
        )
        .distinct()
    )
    sub = W.partitionBy(*cell_cols, "__b").orderBy("h")
    pruned = (
        hashed.withColumn("__b", F.pmod("h", F.lit(_KMV_SUBBUCKETS)))
        .withColumn("__rn", F.row_number().over(sub))
        .filter(F.col("__rn") <= k)
        .drop("__b", "__rn")
    )
    top = W.partitionBy(*cell_cols).orderBy("h")
    return (
        pruned.withColumn("__rn", F.row_number().over(top))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    sketch: DataFrame, to_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Roll sketch rows up to a coarser grain ≡ set union: distinct
    hashes, re-select the k smallest. Operates on kilobytes."""
    merged = sketch.select(*to_cols, "h").distinct()
    top = W.partitionBy(*to_cols).orderBy("h")
    return (
        merged.withColumn("__rn", F.row_number().over(top))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    sketch: DataFrame, cell_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """(cell_cols..., n_h, theta, est): distinct-count estimate per
    cell. A cell that never filled its sketch (n_h < k) is EXACT
    (theta = the full range); a full sketch estimates
    (k-1) * 2^32 / theta in one exact-operand IEEE division."""
    num = float((k - 1) * KMV_RANGE)
    return (
        sketch.groupBy(*cell_cols)
        .agg(F.count(F.lit(1)).alias("n_h"), F.max("h").alias("__hk"))
        .select(
            *cell_cols,
            "n_h",
            F.when(F.col("n_h") < k, F.lit(KMV_RANGE).cast("bigint"))
            .otherwise(F.col("__hk"))
            .alias("theta"),
            F.when(F.col("n_h") < k, F.col("n_h").cast("double"))
            .otherwise(F.lit(num) / F.col("__hk").cast("double"))
            .alias("est"),
        )
    )


def kmv_sketch_sql(
    table: str, cell_cols: list[str], item_col: str, k: int = KMV_K
) -> str:
    """DuckDB: the same k smallest distinct hashes per cell (one-level
    ranking — identical output to the two-level Spark selection)."""
    cells = ", ".join(cell_cols) + ", " if cell_cols else ""
    part = ", ".join(cell_cols) if cell_cols else "1"
    h = md5int_duckdb(f"CAST({item_col} AS VARCHAR)")
    return f"""
  SELECT {cells}h FROM (
    SELECT {cells}h,
      row_number() OVER (PARTITION BY {part} ORDER BY h) AS rn
    FROM (
      SELECT DISTINCT {cells}{h} AS h
      FROM {table} WHERE {item_col} IS NOT NULL
    )
  ) WHERE rn <= {k}
"""


def kmv_estimate_sql(sketch_cte: str, cell_cols: list[str], k: int = KMV_K) -> str:
    """Supports the same empty-cell (global sketch) domain as
    kmv_sketch_sql — no dangling commas, GROUP BY omitted."""
    cells = ", ".join(cell_cols) + ", " if cell_cols else ""
    group = f"GROUP BY {', '.join(cell_cols)}" if cell_cols else ""
    num = float((k - 1) * KMV_RANGE)
    return f"""
  SELECT {cells}n_h,
    CASE WHEN n_h < {k} THEN CAST({KMV_RANGE} AS BIGINT) ELSE hk END AS theta,
    CASE WHEN n_h < {k} THEN CAST(n_h AS DOUBLE)
         ELSE {num!r} / CAST(hk AS DOUBLE) END AS est
  FROM (
    SELECT {cells}COUNT(*) AS n_h, MAX(h) AS hk
    FROM {sketch_cte} {group}
  )
"""
