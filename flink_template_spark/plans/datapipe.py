"""Training-data pipeline operators over ``documents``: deterministic
train/test splitting, text normalization, pattern redaction, and
stratified sampling (BASELINE.json north-star: the operations a
large-scale training-data pipeline needs).

Splitting is HASH-based, not random: split membership must be a pure
function of the record (reproducible across runs, engines, and
backfills; joining a record's features later must land in the same
split). The portable md5-derived integer (functions.hashing) makes it
oracle-checkable too.

Scale notes: every op is a stateless projection or aggregation —
no shuffles beyond the final group-bys, no Python, no collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.functions.hashing import md5int_duckdb, md5int_spark
from flink_template_spark.functions.text import token_count_ws
from flink_template_spark.operators.packing import (
    greedy_oracle_sql,
    pack_chunked,
    pack_greedy,
)
from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table

TRAIN_PCT = 80
VAL_PCT = 10  # test = remainder


def split_of(id_col: str = "doc_id"):
    """train/val/test label from a hash of the stable id (Spark side)."""
    bucket = F.expr(md5int_spark(f"CAST({id_col} AS STRING)")) % 100
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


def _split_sql(id_col: str = "doc_id") -> str:
    b = f"({md5int_duckdb(f'CAST({id_col} AS VARCHAR)')} % 100)"
    return (
        f"CASE WHEN {b} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {b} < {TRAIN_PCT + VAL_PCT} THEN 'val' ELSE 'test' END"
    )


@register(
    "q_train_test_split",
    oracle=f"""
SELECT
  {_split_sql()} AS split,
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY split, lang
ORDER BY split, lang
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split, audited per (split, language) —
    the reproducibility contract of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_of())
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "q_text_normalize",
    oracle="""
SELECT
  doc_id,
  regexp_replace(regexp_replace(lower(trim(text)), '[0-9]+', '<num>', 'g'),
                 ' +', ' ', 'g') AS norm_text,
  length(regexp_replace(regexp_replace(lower(trim(text)), '[0-9]+', '<num>', 'g'),
                        ' +', ' ', 'g')) AS norm_len
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text cleanup: trim, case-fold, numeral folding to a
    placeholder token, whitespace collapse — all JVM-side regex."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[0-9]+", "<num>"),
        " +",
        " ",
    )
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    ).orderBy("doc_id")


_SAMPLE_SEED = "s42:"  # hash salt ≅ sampleBy's seed, but engine-portable


@register(
    "q_stratified_sample",
    oracle=f"""
SELECT lang, COUNT(*) AS n_sampled
FROM documents
WHERE ({md5int_duckdb(f"'{_SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)")}
       % 10000) < 5000
GROUP BY lang
ORDER BY lang
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 50 % sample per language via a SEED-SALTED portable
    record hash: membership = md5('s42:' || doc_id) % 10000 < 5000 — a
    pure function of the row, so the sample is reproducible across
    runs, engines, and backfills (the property Spark's ``sampleBy``
    RNG cannot give; sampleBy's own per-seed determinism is pinned in
    tests/test_datapipe.py). Changing the salt redraws an independent
    sample, which is exactly what a seed is for. Oracle replays the
    identical bucket selection in DuckDB, so this query is hash-exact
    rather than rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            md5int_spark(f"CONCAT('{_SAMPLE_SEED}', CAST(doc_id AS STRING))")
        )
        % 10000
    )
    return (
        docs.filter(bucket < 5000)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


PACK_BUDGET = 256  # tokens per training sequence


@register("q_pack_greedy_bins", oracle=greedy_oracle_sql(PACK_BUDGET))
def q_pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit sequence packing per lang (applyInPandas over
    narrow rows); the oracle replays the identical fold with a DuckDB
    recursive CTE — a pandas grouped-map operator that is still
    hash-exact across engines."""
    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "lang", "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    return pack_greedy(counted, PACK_BUDGET)


@register(
    "q_pack_chunked",
    oracle=f"""
WITH d AS (
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
    SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - n_tokens AS start
  FROM d
)
SELECT lang, doc_id, n_tokens,
  CAST(start // {PACK_BUDGET} AS BIGINT) AS bin_id,
  CAST(start % {PACK_BUDGET} AS BIGINT) AS offset_in_bin
FROM c
""",
)
def q_pack_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing dual: one codegen'd window scan."""
    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "lang", "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    return pack_chunked(counted, PACK_BUDGET)


STRATA_PCT = {"en": 10, "de": 25, "fr": 50, "es": 75, "zh": 100}


@register(
    "q_stratified_sample_hash",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE ({md5int_duckdb("CAST(doc_id AS VARCHAR)")} % 100) <
  CASE lang
    WHEN 'en' THEN 10 WHEN 'de' THEN 25 WHEN 'fr' THEN 50
    WHEN 'es' THEN 75 WHEN 'zh' THEN 100 ELSE 0 END
""",
)
def q_stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep-rate applied
    via the portable record hash — membership is a pure function of the
    row (reproducible across runs, engines, backfills; the property
    sampleBy's engine-specific RNG can't give), so this one IS
    oracle-exact. Downsampling over-represented strata is the standard
    corpus-balancing step."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(md5int_spark("CAST(doc_id AS STRING)")) % 100
    rate = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in STRATA_PCT.items() for x in kv]
        )[F.col("lang")],
        F.lit(0),
    )
    return docs.filter(bucket < rate).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Training-shard layout: deterministic global shuffle into a fixed
# number of shards. The examples-to-shards mapping and the within-shard
# order are pure functions of the stable id (portable md5 hash), so a
# backfill, a re-run, or a different engine produces byte-identical
# shard membership — the property data-loaders need for resumable,
# reproducible training. Scale: one hash-partition exchange into
# n_shards writer tasks; the "shuffle" is the hash ordering itself —
# no global sort, no driver collection.
# ---------------------------------------------------------------------------

N_SHARDS = 8


def _shard_hash(id_col: str = "doc_id"):
    return F.expr(md5int_spark(f"CAST({id_col} AS STRING)"))


def write_training_shards(
    df: DataFrame, path: str, n_shards: int = N_SHARDS, id_col: str = "doc_id"
) -> None:
    """Write ``df`` as ``shard=K/`` parquet directories, one file per
    shard, rows hash-ordered within each shard (deterministic global
    shuffle). ``repartition(n, shard)`` routes each shard wholly into
    one task so every shard directory gets exactly one file."""
    h = _shard_hash(id_col)
    (
        df.withColumn("shard", (h % n_shards).cast("int"))
        .withColumn("__h", h)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__h", id_col)
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


_SHARD_D = md5int_duckdb("CAST(doc_id AS VARCHAR)")


@register(
    "q_training_shards",
    oracle=f"""
SELECT doc_id, shard, pos
FROM (
  SELECT doc_id,
    ({_SHARD_D} % 8) AS shard,
    ROW_NUMBER() OVER (
      PARTITION BY ({_SHARD_D} % 8)
      ORDER BY {_SHARD_D}, doc_id
    ) AS pos
  FROM documents
) t
ORDER BY shard, pos
""",
)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard writer's row→(shard, position) mapping as a query:
    deterministic shard id + hash-order position within the shard."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = _shard_hash()
    w = W.partitionBy("shard").orderBy("__h", "doc_id")
    return (
        docs.select(
            "doc_id",
            (h % N_SHARDS).cast("bigint").alias("shard"),
            h.alias("__h"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


@register(
    "q_weighted_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ({md5int_duckdb("'w' || CAST(doc_id AS VARCHAR)")} % 1000) < n_chars
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling: keep probability ∝ n_chars (longer
    docs over-sampled, the standard quality/length-weighted corpus
    mixing step). Membership = pure integer comparison on the portable
    record hash — exactly reproducible across engines and backfills,
    and embarrassingly parallel (a map-side filter, no shuffle at any
    scale). Salting the hash input ('w' prefix) decorrelates this
    sampler from the train/test splitter that hashes the same ids."""
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(md5int_spark("'w' || CAST(doc_id AS STRING)")) % 1000
    return docs.filter(u < F.col("n_chars")).select("doc_id", "lang", "n_chars")


@register(
    "q_consistent_sample_topk",
    oracle=f"""
SELECT event_id, user_id, event_type
FROM events
ORDER BY {md5int_duckdb("CAST(event_id AS VARCHAR)")}, event_id
LIMIT 500
""",
)
def q_consistent_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample as a deterministic hash-order top-k
    (the distributed stand-in for reservoir sampling: same marginal
    distribution, but a pure function of the data). Spark executes
    ORDER BY hash LIMIT k as TakeOrderedAndProject — per-partition
    heaps, no global sort — so it holds at any scale. Growing the
    dataset only ever *replaces* sample members (consistent sampling),
    which keeps downstream eval sets stable across snapshots."""
    events = load_table(spark, sf_dir, "events")
    h = F.expr(md5int_spark("CAST(event_id AS STRING)"))
    return (
        events.orderBy(h, "event_id")
        .select("event_id", "user_id", "event_type")
        .limit(500)
    )


@register(
    "q_scd2_merge",
    oracle="""
SELECT c_custkey AS cust_id, c_mktsegment AS segment,
       CAST(c_acctbal AS DOUBLE) AS balance,
       DATE '2020-01-01' AS valid_from,
       CASE WHEN c_custkey % 7 = 0 THEN DATE '2024-03-01'
            ELSE DATE '9999-12-31' END AS valid_to,
       c_custkey % 7 <> 0 AS is_current
FROM customer
UNION ALL
SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) + 100,
       DATE '2024-03-01', DATE '9999-12-31', true
FROM customer WHERE c_custkey % 7 = 0
""",
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance (operators.scd.scd2_merge): a
    customer snapshot dimension merged with a CDC batch where every 7th
    key changed balance and every 5th sent an identical no-op row.
    The oracle states the POST-merge table directly: changed keys close
    at the effective date and reopen, no-ops cause zero version churn —
    proving the merge's version algebra, not just row counts."""
    from flink_template_spark.operators.scd import scd2_merge

    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").cast("double").alias("balance"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit("9999-12-31").cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed = F.col("cust_id") % 7 == 0
    noop = (F.col("cust_id") % 7 != 0) & (F.col("cust_id") % 5 == 0)
    updates = (
        dim.select("cust_id", "segment", "balance")
        .filter(changed | noop)
        .withColumn(
            "balance",
            F.when(changed, F.col("balance") + 100).otherwise(F.col("balance")),
        )
    )
    return scd2_merge(
        dim, updates, "cust_id", ["segment", "balance"], F.lit("2024-03-01")
    )


_QUALITY_SQL = """
    0.5 * LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
    + 0.5 * LEAST(CAST(len(list_filter(string_split(text, ' '),
          t -> t IN ('the', 'a'))) AS DOUBLE)
        / len(string_split(text, ' ')) * 10.0, 1.0)
    - 0.25 * (CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
          AS DOUBLE) / length(text))
"""


@register(
    "q_training_data_pipeline",
    oracle=f"""
WITH RECURSIVE keepers AS (
  SELECT MIN(doc_id) AS doc_id, MIN_BY(lang, doc_id) AS lang, text
  FROM documents
  WHERE ROUND({_QUALITY_SQL}, 6) >= 0.3
  GROUP BY text
),
enriched AS (
  SELECT doc_id,
         {_split_sql("doc_id")} || '/' || lang AS cell,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM keepers
),
d AS (
  SELECT cell, doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY doc_id) AS rn
  FROM enriched
),
packed(cell, rn, doc_id, n_tokens, bin_id, filled) AS (
  SELECT cell, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.cell, d.rn, d.doc_id, d.n_tokens,
    CASE WHEN p.filled + d.n_tokens > 512 THEN p.bin_id + 1
         ELSE p.bin_id END,
    CASE WHEN p.filled + d.n_tokens > 512 THEN d.n_tokens
         ELSE p.filled + d.n_tokens END
  FROM packed p JOIN d ON d.cell = p.cell AND d.rn = p.rn + 1
)
SELECT cell, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       ({md5int_duckdb("cell || '/' || CAST(bin_id AS VARCHAR)")} % 8) AS shard
FROM packed
GROUP BY cell, bin_id
""",
)
def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline, composed from the
    individually-oracled stages: quality filter (functions.text) →
    exact dedup keep-first (operators.dedup's groupBy-min) → hash-based
    train/val/test split (split_of) → whitespace token counts →
    token-budget sequence packing per (split, lang) (operators.packing)
    → per-bin manifest with deterministic shard assignment. The oracle
    replays the WHOLE composition (quality expression, keep-first
    min/min_by dedup, split CASE, recursive-CTE greedy fold, shard
    hash) — the flagship is hash-exact end-to-end, not just rows-only;
    documents in, packed-shard manifest out, one lazy plan, no driver
    collection at any stage."""
    from flink_template_spark.functions.hashing import md5int_spark
    from flink_template_spark.functions.text import quality_score, token_count_ws
    from flink_template_spark.operators.packing import pack_greedy

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("q", quality_score(F.col("text"))).filter(
        F.col("q") >= 0.3
    )
    keepers = scored.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        # keep-first semantics: every kept attribute comes from the SAME
        # row (the min-doc_id copy), so no synthetic (doc_id, lang) pairs
        F.min_by("lang", "doc_id").alias("lang"),
    )
    enriched = keepers.select(
        "doc_id",
        "lang",
        split_of("doc_id").alias("split"),
        token_count_ws(F.col("text")).alias("n_tokens"),
        F.concat_ws("/", split_of("doc_id"), F.col("lang")).alias("cell"),
    )
    packed = pack_greedy(
        enriched, budget=512, group_col="cell", id_col="doc_id",
        tokens_col="n_tokens",
    )
    # hash the FULL bin identity — bin_id restarts at 0 within each
    # (split, lang) cell, so hashing bin_id alone would map bin k of
    # every cell to the same shard (systematic skew)
    shard = (
        F.expr(md5int_spark("CONCAT(cell, '/', CAST(bin_id AS STRING))")) % 8
    ).alias("shard")
    return (
        packed.groupBy("cell", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .select("cell", "bin_id", "n_docs", "bin_tokens", shard)
        .orderBy("cell", "bin_id")
    )


def rendezvous_shard(
    id_col: str, n_shards: int, salt: str = "rz"
) -> F.Column:
    """Rendezvous (highest-random-weight) shard assignment as a pure
    map-side expression: shard = argmax over s of h(salt:id:s), ties to
    the lowest s. Unlike ``hash % n`` (q_training_shards), growing the
    shard count from N to N+1 moves only ~1/(N+1) of the corpus — each
    doc moves iff the NEW shard's weight beats its current maximum —
    which is what keeps a 100 TB re-shard (or a shard-count bump on a
    live dataset) from rewriting every file. Weights are the portable
    md5 integer, so assignment is reproducible across engines and
    backfills (same contract as the samplers above).

    The argmax folds through ``greatest`` over (weight, -s) structs —
    row-local codegen expressions, zero shuffle at any scale."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_shards == 1:
        # F.greatest needs >= 2 args; one shard wins every race anyway
        return F.lit(0).cast("bigint")
    cands = [
        F.struct(
            F.expr(
                md5int_spark(
                    f"CONCAT('{salt}:', CAST({id_col} AS STRING), ':', '{s}')"
                )
            ).alias("w"),
            F.lit(-s).alias("ns"),
        )
        for s in range(n_shards)
    ]
    return (-F.greatest(*cands).getField("ns")).cast("bigint")


def _rendezvous_oracle(n_shards: int, salt: str = "rz") -> str:
    w = md5int_duckdb(
        f"'{salt}:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)"
    )
    return f"""
SELECT doc_id, shard FROM (
  SELECT doc_id, s AS shard,
    ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY {w} DESC, s
    ) AS rk
  FROM documents, unnest(range(0, {n_shards})) AS t(s)
) WHERE rk = 1
"""


@register("q_rendezvous_shards", oracle=_rendezvous_oracle(N_SHARDS))
def q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent shard assignment via rendezvous hashing (see
    rendezvous_shard); the movement bound under shard-count growth is
    pinned in tests/test_datapipe.py."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rendezvous_shard("doc_id", N_SHARDS).alias("shard")
    )


_PRIORITY_K = 5
_PRIORITY_SALT = "ps"


@register(
    "q_priority_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars, priority FROM (
  SELECT doc_id, lang, n_chars,
    (({md5int_duckdb(f"'{_PRIORITY_SALT}:' || CAST(doc_id AS VARCHAR)")} + 1)
      / 4294967296.0) / n_chars AS priority,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY (({md5int_duckdb(f"'{_PRIORITY_SALT}:' || CAST(doc_id AS VARCHAR)")} + 1)
        / 4294967296.0) / n_chars, doc_id
    ) AS rk
  FROM documents WHERE n_chars > 0
) WHERE rk <= {_PRIORITY_K}
""",
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM'07): weighted
    WITHOUT-replacement k-per-stratum — each doc gets priority u/w
    (u uniform from the portable hash, w = n_chars) and the k smallest
    priorities per language win, giving heavier docs proportionally
    higher inclusion odds plus unbiased subset-sum estimators (the
    (k+1)-th priority is the estimation threshold). Complements
    q_weighted_sample's Bernoulli design (variable size, independent)
    with a FIXED-size-per-stratum draw.

    Engine-portable with zero tolerance: u = (h+1)/2^32 divides by a
    power of two (exact in IEEE), and u/w is one correctly-rounded
    division both engines perform identically — so even the priority
    VALUES hash-match, no rounding discipline needed. Per-stratum
    top-k = partitioned window heap, no global sort."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.expr(
            md5int_spark(
                f"CONCAT('{_PRIORITY_SALT}:', CAST(doc_id AS STRING))"
            )
        )
        + 1
    ) / F.lit(4294967296.0)
    pri = u / F.col("n_chars")
    w = W.partitionBy("lang").orderBy(pri.asc(), F.col("doc_id").asc())
    return (
        docs.select(
            "doc_id", "lang", "n_chars", pri.alias("priority"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= _PRIORITY_K)
        .select("doc_id", "lang", "n_chars", "priority")
    )


# ---------------------------------------------------------------------------
# Z-order layout: multi-dimensional file-skipping bounds
# ---------------------------------------------------------------------------

_Z_BITS = 6  # 64x64 quantized grid -> 12-bit Morton key
_Z_PRICE_BUCKET = 2048.0  # price in [901.82, 104997.88] -> buckets 0..51
_Z_PARTS_SHIFT = 8  # top 4 of 12 bits -> 16 partitions = 4x4 tile grid


def _zorder_oracle() -> str:
    from flink_template_spark.functions.zorder import morton_interleave_sql

    z = morton_interleave_sql("qx", "qy", _Z_BITS)
    return f"""
WITH q AS (
  SELECT
    CAST(floor(l_extendedprice / {_Z_PRICE_BUCKET}) AS BIGINT) AS qx,
    CAST(floor(l_quantity) - 1 AS BIGINT) AS qy,
    l_extendedprice, l_quantity
  FROM lineitem
)
SELECT {z} // {1 << _Z_PARTS_SHIFT} AS pid,
  COUNT(*) AS n_rows,
  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
FROM q
GROUP BY 1
ORDER BY pid
"""


@register("q_zorder_layout", oracle=_zorder_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (functions.zorder): lineitem rows keyed by
    the Morton interleave of quantized (price, quantity), bucketed into
    the 16 top-bit partitions, reporting each partition's row count and
    per-dimension min/max — the exact bounds parquet footer stats would
    carry if the table were written with
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)``. Because
    top-bit blocks of a Morton key are ALIGNED tiles, every partition's
    box spans at most 1/4 of each dimension's range (tested), so a
    predicate on EITHER price or quantity prunes ~3/4 of files — the
    reason to z-order a 100 TB fact table instead of sorting it by one
    column. Quantization uses floor (a bare double→int CAST rounds in
    DuckDB but truncates in Spark — the cross-engine trap)."""
    from flink_template_spark.functions.zorder import morton_interleave

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    qx = F.floor(F.col("l_extendedprice") / F.lit(_Z_PRICE_BUCKET))
    qy = F.floor(F.col("l_quantity")) - F.lit(1)
    zkey = morton_interleave(qx, qy, _Z_BITS)
    return (
        li.select(
            F.shiftright(zkey, _Z_PARTS_SHIFT).alias("pid"),
            "l_quantity",
            "l_extendedprice",
        )
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("pid")
    )


# ---------------------------------------------------------------------------
# Curriculum ordering: easy-to-hard with deterministic source interleave
# ---------------------------------------------------------------------------

_CURRICULUM_SAMPLE = 25


@register(
    "q_curriculum_order",
    oracle=f"""
SELECT pos, doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
    CAST(row_number() OVER (ORDER BY rk, source, doc_id) AS BIGINT) AS pos
  FROM (
    SELECT doc_id, source, n_chars,
      row_number() OVER (
        PARTITION BY source ORDER BY n_chars, doc_id
      ) AS rk
    FROM documents WHERE n_chars > 0
  )
)
WHERE pos % {_CURRICULUM_SAMPLE} = 0
ORDER BY pos
""",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: rank docs easy→hard (n_chars as the
    difficulty proxy) WITHIN each source, then emit the global
    position under the (within-source-rank, source, doc_id) total
    order — a deterministic round-robin interleave, so consecutive
    training positions rotate across sources instead of feeding the
    model one source's run (the ordering/mixing stage of a training
    pipeline, reproducible across backfills because every rank is a
    pure function of the data). The global position uses the two-pass
    range-partitioned rank (operators.rank_global) — no
    single-partition window over the corpus; the per-source rank
    windows are source-partitioned. Sampled every 25th position so the
    oracle verifies the order densely end to end."""
    from pyspark.sql import Window as W

    from flink_template_spark.operators.rank_global import with_global_ranks

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id", "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    pos = with_global_ranks(
        ranked,
        [(F.col("rk"), True), (F.col("source"), True)],
        tiebreak=["doc_id"],
        row_number_col="pos",
    )
    return (
        pos.filter(F.col("pos") % _CURRICULUM_SAMPLE == 0)
        .select(F.col("pos").cast("bigint").alias("pos"), "doc_id", "source", "n_chars")
        .orderBy("pos")
    )


_RESAMPLE_M = 100  # systematic picks drawn from the weight line


@register(
    "q_systematic_resample",
    oracle=f"""
WITH w AS (
  SELECT doc_id, n_chars AS wt,
    SUM(n_chars) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi
  FROM documents
),
tot AS (SELECT SUM(n_chars) AS w_all FROM documents)
SELECT doc_id, CAST(wt AS BIGINT) AS weight,
  CAST((cum_hi * {_RESAMPLE_M}) // w_all
       - ((cum_hi - wt) * {_RESAMPLE_M}) // w_all AS BIGINT) AS n_copies
FROM w CROSS JOIN tot
WHERE (cum_hi * {_RESAMPLE_M}) // w_all
      > ((cum_hi - wt) * {_RESAMPLE_M}) // w_all
ORDER BY doc_id
""",
)
def q_systematic_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic resampling: draw exactly
    {_RESAMPLE_M} picks (with multiplicity) proportional to integer
    document weights — the RNG-free "apply the importance weights" step
    that turns DSIR-style weights into an actual resampled corpus.
    A document is picked once per stride boundary falling inside its
    weight interval on the cumulative line: n_copies =
    floor(cum_hi*M/W) - floor(cum_lo*M/W); the telescoping sum makes
    the total exactly M, every run, every engine.

    Exactness: weights and cumulative sums are integers; the stride
    test is integer floor-division on non-negative operands (no
    truncate-vs-floor skew) — bit-exact. Int64 headroom: cum*M must fit
    bigint, i.e. total weight below ~9e16 at M=100 — about 90 PB of
    text; past that the cumulative line moves to DECIMAL(38,0) with
    identical semantics (documented, not needed).

    Scale shape: the global cumulative sum is the two-pass
    range-partitioned prefix sum (operators.rank_global.
    with_global_prefix_sum — range exchange + local windows + a
    broadcast offsets table of <= shuffle-partition rows), never a
    single-partition window; the total is one scalar broadcast."""
    from flink_template_spark.operators.rank_global import (
        with_global_prefix_sum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("wt")
    )
    cum = with_global_prefix_sum(
        docs, [("doc_id", True)], "wt", out_col="cum_hi"
    )
    tot = docs.agg(F.sum("wt").alias("w_all"))
    m = F.lit(_RESAMPLE_M)
    hi = F.expr(f"(cum_hi * {_RESAMPLE_M}) DIV w_all")
    lo = F.expr(f"((cum_hi - wt) * {_RESAMPLE_M}) DIV w_all")
    return (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("n_copies", (hi - lo).cast("bigint"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            F.col("wt").cast("bigint").alias("weight"),
            "n_copies",
        )
        .orderBy("doc_id")
    )


_LEN_BUCKETS = [2 ** p for p in range(4, 17)]  # 16 .. 65536


@register(
    "q_length_bucket_efficiency",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
bucketed AS (
  SELECT doc_id, n_tok,
    COALESCE(list_min(list_filter({_LEN_BUCKETS},
                                  x -> x >= n_tok)),
             {_LEN_BUCKETS[-1]}) AS bucket
  FROM toks
)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(LEAST(n_tok, bucket)) AS BIGINT) AS sum_tokens,
  CAST(SUM(bucket - LEAST(n_tok, bucket)) AS BIGINT) AS pad_tokens,
  ROUND(CAST(SUM(LEAST(n_tok, bucket)) AS DOUBLE)
        / CAST(SUM(bucket) AS DOUBLE), 6) AS efficiency
FROM bucketed
GROUP BY bucket
ORDER BY bucket
""",
)
def q_length_bucket_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing audit: assign each document to the
    smallest power-of-two length bucket holding its whitespace token
    count (capped at the top bucket = truncation), and report per
    bucket how much of the padded batch is real tokens — the number
    that decides a training job's bucket boundaries (efficiency far
    below 1.0 = wasted FLOPs on pad tokens; documents above the cap
    lose sum(n_tok - bucket) tokens to truncation).

    Exactness: all integer (token counts, literal bucket array, LEAST,
    sums) with one final division of exact integers. Scale shape: one
    map-side bucket assignment against a 13-element literal array, one
    bucket-keyed aggregate — nothing wider than the bucket count ever
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    buckets = F.array(*[F.lit(b) for b in _LEN_BUCKETS])
    toks = docs.select(
        F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    bucketed = toks.withColumn(
        "bucket",
        F.coalesce(
            F.array_min(
                F.filter(buckets, lambda x: x >= F.col("n_tok"))
            ),
            F.lit(_LEN_BUCKETS[-1]),
        ),
    )
    tok_in = F.least(F.col("n_tok"), F.col("bucket"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(tok_in).cast("bigint").alias("sum_tokens"),
            F.sum(F.col("bucket") - tok_in).cast("bigint").alias("pad_tokens"),
            F.round(
                F.sum(tok_in).cast("double") / F.sum("bucket").cast("double"),
                6,
            ).alias("efficiency"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_docs",
            "sum_tokens",
            "pad_tokens",
            "efficiency",
        )
        .orderBy("bucket")
    )


_DECAY_WEEK_CAP = 20  # shift cap: past ~20 half-lives nothing survives


@register(
    "q_time_decay_sample",
    oracle=f"""
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
aged AS (
  SELECT event_id,
    LEAST(date_diff('day', CAST(ts AS DATE), mx.maxd) // 7,
          {_DECAY_WEEK_CAP}) AS age_wk
  FROM events CROSS JOIN mx
),
tagged AS (
  SELECT age_wk,
    CASE WHEN ({md5int_duckdb("'d' || CAST(event_id AS VARCHAR)")} % 1048576)
              < (1048576 // (1 << CAST(age_wk AS INT)))
         THEN 1 ELSE 0 END AS kept
  FROM aged
)
SELECT CAST(age_wk AS BIGINT) AS age_wk,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(kept) AS BIGINT) AS n_kept,
  ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 6) AS keep_rate
FROM tagged
GROUP BY age_wk
ORDER BY age_wk
""",
)
def q_time_decay_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted sampling: keep probability halves per week of
    age (piecewise-exponential decay, threshold = 2^20 >> age_weeks) —
    the deterministic "recent data matters more" sampler a freshness-
    sensitive training mix uses, reported as per-age-week keep rates.

    Exactness: age is whole-day date arithmetic, the decay threshold
    is a pure bit shift, and acceptance is an integer comparison on
    the salted portable record hash — no float pow anywhere, so both
    engines accept the identical row set. Scale shape: one map-side
    tag (max-date broadcast) + one bucket-keyed aggregate; the sampler
    itself (the ``kept`` predicate) is a shuffle-free filter at any
    corpus size, and re-running on a grown corpus keeps every
    still-recent previous pick whose bucket didn't age (consistent
    sampling under the same hash)."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("maxd"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "event_id",
        F.least(
            F.floor(
                F.datediff(F.col("maxd"), F.col("ts").cast("date")) / 7
            ),
            F.lit(_DECAY_WEEK_CAP),
        ).alias("age_wk"),
    )
    u = F.expr(md5int_spark("'d' || CAST(event_id AS STRING)")) % 1048576
    thr = F.expr(
        "CAST(1048576 AS BIGINT) DIV CAST(SHIFTLEFT(1, CAST(age_wk AS INT)) AS BIGINT)"
    )
    tagged = aged.select(
        "age_wk", F.when(u < thr, 1).otherwise(0).alias("kept")
    )
    return (
        tagged.groupBy("age_wk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.round(
                F.sum("kept").cast("double") / F.count(F.lit(1)), 6
            ).alias("keep_rate"),
        )
        .select(
            F.col("age_wk").cast("bigint").alias("age_wk"),
            "n_total",
            "n_kept",
            "keep_rate",
        )
        .orderBy("age_wk")
    )


_ZM_SHARDS = 32
_ZM_LO = "1997-01-01"  # audited predicate: one quarter, half-open
_ZM_HI = "1997-04-01"


def _zonemap_oracle() -> str:
    h = md5int_duckdb("CAST(o_orderkey AS VARCHAR)")
    return f"""
WITH hash_shards AS (
  SELECT ({h}) % {_ZM_SHARDS} AS shard, o_orderdate FROM orders
),
range_shards AS (
  SELECT ((ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
          * {_ZM_SHARDS}) // (SELECT COUNT(*) FROM orders) AS shard,
         o_orderdate
  FROM orders
),
both_layouts AS (
  SELECT 'hash' AS layout, shard, o_orderdate FROM hash_shards
  UNION ALL
  SELECT 'range' AS layout, shard, o_orderdate FROM range_shards
),
zonemaps AS (
  SELECT layout, shard, MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax,
         COUNT(*) AS n_rows
  FROM both_layouts GROUP BY layout, shard
)
SELECT layout,
  CAST(COUNT(*) AS BIGINT) AS n_shards,
  CAST(SUM(CASE WHEN zmax < TIMESTAMP '{_ZM_LO}'
                  OR zmin >= TIMESTAMP '{_ZM_HI}'
            THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
  CAST(SUM(n_rows) AS BIGINT) AS rows_total,
  CAST(SUM(CASE WHEN zmax < TIMESTAMP '{_ZM_LO}'
                  OR zmin >= TIMESTAMP '{_ZM_HI}'
            THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
  ROUND(CAST(SUM(CASE WHEN zmax < TIMESTAMP '{_ZM_LO}'
                        OR zmin >= TIMESTAMP '{_ZM_HI}'
                  THEN n_rows ELSE 0 END) AS DOUBLE)
        / CAST(SUM(n_rows) AS DOUBLE), 6) AS frac_rows_skipped
FROM zonemaps
GROUP BY layout
ORDER BY layout
"""


@register("q_shard_zonemap", oracle=_zonemap_oracle())
def q_shard_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (data-skipping) effectiveness audit: lay ``orders`` out
    into {_ZM_SHARDS} shards two ways — hash-sharded (the naive layout)
    and date-range-sharded (the clustered layout q_zorder_layout
    generalizes) — build each shard's min/max zone map on the filter
    column, and report how many shards (and rows) a quarter-range
    predicate could SKIP from manifest stats alone. This is the number
    a 100 TB table layout decision is actually made on: hash layouts
    read everything (every shard's [min,max] spans the full history),
    range layouts skip ~15/16 of the data for a one-quarter scan —
    the audit quantifies it instead of asserting it.

    Scale shape: zone maps are a per-shard MIN/MAX/COUNT partial agg
    (manifest-sized output, {_ZM_SHARDS} rows per layout); the range
    layout's shard assignment uses the two-pass range-partitioned rank
    (operators.rank_global) — no single-partition data window; the
    1-row total count rides as a broadcast crossJoin. The skip test is
    pure zone-map arithmetic, exactly what an engine's manifest pruner
    evaluates — no data re-scan."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    hash_shards = orders.select(
        F.lit("hash").alias("layout"),
        (F.expr(md5int_spark("CAST(o_orderkey AS STRING)")) % _ZM_SHARDS).alias(
            "shard"
        ),
        "o_orderdate",
    )
    n_rows = orders.agg(F.count(F.lit(1)).alias("__n"))
    range_shards = (
        with_global_ranks(
            orders,
            [(F.col("o_orderdate"), True)],
            tiebreak=["o_orderkey"],
            row_number_col="rn",
        )
        .crossJoin(F.broadcast(n_rows))
        .select(
            F.lit("range").alias("layout"),
            # Integer floor division, mirroring the oracle's `//`
            # exactly: a double quotient can round across an integer at
            # extreme row counts (~1e14+ rows), DIV cannot.
            F.expr(f"(rn - 1) * {_ZM_SHARDS}L DIV __n").alias("shard"),
            "o_orderdate",
        )
    )
    zonemaps = (
        hash_shards.unionByName(range_shards)
        .groupBy("layout", "shard")
        .agg(
            F.min("o_orderdate").alias("zmin"),
            F.max("o_orderdate").alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    skip = (F.col("zmax") < F.lit(_ZM_LO).cast("timestamp")) | (
        F.col("zmin") >= F.lit(_ZM_HI).cast("timestamp")
    )
    return (
        zonemaps.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum(F.when(skip, 1).otherwise(0)).cast("bigint").alias("n_skippable"),
            F.sum("n_rows").cast("bigint").alias("rows_total"),
            F.sum(F.when(skip, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_skipped"),
        )
        .withColumn(
            "frac_rows_skipped",
            F.round(
                F.col("rows_skipped").cast("double")
                / F.col("rows_total").cast("double"),
                6,
            ),
        )
        .orderBy("layout")
    )


_SKEW_REDUCERS = 32


def _skew_oracle() -> str:
    h = md5int_duckdb("CAST(l_orderkey AS VARCHAR)")
    return f"""
WITH keyed AS (
  SELECT l_orderkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_orderkey
),
assigned AS (
  SELECT ({h}) % {_SKEW_REDUCERS} AS reducer, n_rows FROM keyed
),
loads AS (
  SELECT reducer, COUNT(*) AS n_keys, SUM(n_rows) AS n_rows
  FROM assigned GROUP BY reducer
),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM loads)
SELECT reducer,
  CAST(n_keys AS BIGINT) AS n_keys,
  CAST(n_rows AS BIGINT) AS n_rows,
  ROUND(CAST(n_rows AS DOUBLE)
        / (CAST(total AS DOUBLE) / {_SKEW_REDUCERS}.0), 6) AS load_ratio
FROM loads CROSS JOIN tot
ORDER BY reducer
"""


@register("q_shuffle_skew_audit", oracle=_skew_oracle())
def q_shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join shuffle-balance audit: hash ``lineitem``'s join key
    into {_SKEW_REDUCERS} reducers with the portable hash and report
    each reducer's key count, row count, and load vs the uniform ideal
    (load_ratio 1.0 = perfectly balanced; a 3.0 reducer is the
    straggler that makes a 1000-executor join run at 1/3 speed). This
    is the diagnostic you run BEFORE a 100 TB shuffle to decide
    whether the plain hash join is safe or the salted/AQE path
    (operators.skew, q_salted_join_revenue) is needed — measured on
    the key HISTOGRAM (one hash-agg, Zipf-small), never by running
    the join.

    Exactness: integer counts end-to-end; load_ratio is one division
    against the exact uniform share, 6-dp rounded."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    keyed = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_rows"))
    assigned = keyed.select(
        (
            F.expr(md5int_spark("CAST(l_orderkey AS STRING)")) % _SKEW_REDUCERS
        ).alias("reducer"),
        "n_rows",
    )
    loads = assigned.groupBy("reducer").agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n_rows").alias("n_rows")
    )
    tot = loads.agg(F.sum("n_rows").cast("bigint").alias("total"))
    return (
        loads.crossJoin(F.broadcast(tot))
        .select(
            "reducer",
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round(
                F.col("n_rows").cast("double")
                / (F.col("total").cast("double") / float(_SKEW_REDUCERS)),
                6,
            ).alias("load_ratio"),
        )
        .orderBy("reducer")
    )


_GEO_SPAN = 4000  # integer centi-units per axis (a ~40 km square at 1 unit ≈ 10 m)
_GEO_R = 15  # radius: pairs within 150 m


def _geo_pts_cte() -> str:
    """ONE copy of the deterministic point-cloud CTE shared by the
    radius-pair join and the DBSCAN classifier — the two queries must
    agree on the exact same cloud."""
    hx = md5int_duckdb("concat(CAST(c_custkey AS VARCHAR), 'x')")
    hy = md5int_duckdb("concat(CAST(c_custkey AS VARCHAR), 'y')")
    return (
        f"SELECT c_custkey AS id, ({hx}) % {_GEO_SPAN} AS x, "
        f"({hy}) % {_GEO_SPAN} AS y FROM customer"
    )


def _geo_points(cust: DataFrame) -> DataFrame:
    """Spark dual of :func:`_geo_pts_cte`."""
    return cust.select(
        F.col("c_custkey").alias("id"),
        (
            F.expr(md5int_spark("concat(CAST(c_custkey AS STRING), 'x')"))
            % _GEO_SPAN
        ).alias("x"),
        (
            F.expr(md5int_spark("concat(CAST(c_custkey AS STRING), 'y')"))
            % _GEO_SPAN
        ).alias("y"),
    )


def _radius_join_oracle() -> str:
    return f"""
WITH pts AS (
  {_geo_pts_cte()}
)
SELECT a.id AS id_a, b.id AS id_b,
  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_GEO_R * _GEO_R}
ORDER BY id_a, id_b
"""


@register("q_spatial_radius_pairs", oracle=_radius_join_oracle())
def q_spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial radius self-join (operators.spatial): all
    point pairs within _GEO_R (15) integer units over a deterministic
    point cloud derived from customer keys (portable-hash coordinates,
    so both engines build the identical cloud). The oracle is the
    brute-force all-pairs scan — identical output, quadratic cost the
    grid join avoids (cell + 3×3 neighborhood equi-join, candidates
    bounded by local density; the LSH candidate/verify shape applied
    to coordinates).

    Scale shape pinned by test_spatial_radius_join_no_cartesian: an
    equi-join on cell ids, never a CartesianProduct; the 9× expansion
    rides one side only; the exact integer verify is map-side."""
    from flink_template_spark.operators.spatial import radius_self_join

    cust = load_table(spark, sf_dir, "customer")
    return (
        radius_self_join(_geo_points(cust), _GEO_R)
        .select("id_a", "id_b", F.col("d2").cast("bigint").alias("d2"))
        .orderBy("id_a", "id_b")
    )


_BASKET_MINSUP = 2  # minimum co-occurrence support
_BASKET_TOP = 20

# ONE copy of the market-basket candidate pipeline (distinct baskets →
# item supports → within-order frequent pairs), shared by
# q_basket_pairs and q_assoc_rules in BOTH engines so the candidate
# bound can never drift between the lift and the confidence readouts
_BASKET_CTE_SQL = f"""d AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
item AS (SELECT p, COUNT(*) AS cnt FROM d GROUP BY p),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS support
  FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MINSUP}
)"""


def _frequent_part_pairs(li: DataFrame):
    """Shared market-basket candidate pipeline: returns
    ``(d, item, pairs)`` — the pinned distinct (order, part) basket
    table, per-part supports, and within-order frequent pairs
    (support ≥ {_BASKET_MINSUP}, columns part_a < part_b). The
    self-join is an equi-join on the order key — never a cartesian —
    so pair volume is bounded by Σ basket_size²."""
    # d has many consumers across both callers (both pair sides, item
    # counts, order total): pin one materialized distinct
    # (multi-consumer subtree policy)
    d = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # item also has two consumers in every caller (cnt_a/cnt_b joins,
    # or both rule directions): pin the tiny per-part support table too
    item = (
        d.groupBy("p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = d.select(F.col("o"), F.col("p").alias("part_a"))
    b = d.select(F.col("o"), F.col("p").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MINSUP)
    )
    return d, item, pairs


@register(
    "q_basket_pairs",
    oracle=f"""
WITH {_BASKET_CTE_SQL},
n_ord AS (SELECT COUNT(DISTINCT o) AS n_orders FROM d)
SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
  CAST(ia.cnt AS BIGINT) AS cnt_a, CAST(ib.cnt AS BIGINT) AS cnt_b,
  ROUND(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)
        / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)), 6) AS lift
FROM pairs
JOIN item ia ON pairs.part_a = ia.p
JOIN item ib ON pairs.part_b = ib.p
CROSS JOIN n_ord
ORDER BY support DESC, part_a, part_b
LIMIT {_BASKET_TOP}
""",
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (apriori round 2): part pairs bought
    together in >= {_BASKET_MINSUP} orders, with their independence
    lift — the association-rule primitive behind co-purchase
    recommenders and (in a training-data pipeline) co-occurrence
    priors over document collections.

    Scale shape: candidate pairs come only from WITHIN an order (the
    self-join is an equi-join on the order key — never a cartesian),
    so pair volume is bounded by Σ basket_size², with TPC-H baskets
    ≤7 lines; the support count and both item-count joins are
    key-partitioned hash operations with map-side partials, and the
    top-{_BASKET_TOP} is TakeOrderedAndProject (never a full sort).
    Integer counts end-to-end; lift is one fixed IEEE dag, 6-dp."""
    li = load_table(spark, sf_dir, "lineitem")
    d, item, pairs = _frequent_part_pairs(li)
    n_ord = d.agg(F.count_distinct("o").alias("n_orders"))
    return (
        pairs.join(item.withColumnRenamed("p", "part_a").withColumnRenamed("cnt", "cnt_a"), "part_a")
        .join(item.withColumnRenamed("p", "part_b").withColumnRenamed("cnt", "cnt_b"), "part_b")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("bigint").alias("support"),
            F.col("cnt_a").cast("bigint").alias("cnt_a"),
            F.col("cnt_b").cast("bigint").alias("cnt_b"),
            F.round(
                F.col("support").cast("double") * F.col("n_orders").cast("double")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


@register(
    "q_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS revenue
  FROM lineitem GROUP BY l_partkey
),
cum AS (
  SELECT l_partkey, revenue,
    SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum_rev,
    SUM(revenue) OVER () AS total_rev
  FROM rev
),
classed AS (
  SELECT *,
    CASE WHEN cum_rev * 10 <= total_rev * 8 THEN 'A'
         WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
         ELSE 'C' END AS abc_class
  FROM cum
)
SELECT abc_class,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(revenue) AS DOUBLE) AS class_revenue,
  ROUND(CAST(SUM(revenue) AS DOUBLE) / CAST(MAX(total_rev) AS DOUBLE), 6)
    AS revenue_share
FROM classed GROUP BY 1 ORDER BY 1
""",
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A =
    parts inside the first 80% of cumulative revenue, B to 95%, C the
    tail — the Pareto working-capital split every inventory/SKU
    pipeline starts from.

    Float discipline: the cumulative and total revenues are exact
    DECIMAL sums and the class boundaries are DECIMAL comparisons
    scaled to integers (cum·10 ≤ total·8), so classification never
    touches a float; only the reported share divides.

    Scale shape: per-part hash agg, then the cumulative revenue comes
    from operators.rank_global.with_global_prefix_sum — the two-pass
    range-partitioned prefix sum, never a single-partition window over
    all parts. (The oracle's OVER () window is DuckDB-side only.)"""
    from flink_template_spark.operators.rank_global import with_global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).alias("revenue")
    )
    cum = with_global_prefix_sum(
        rev,
        [(F.col("revenue"), False), (F.col("l_partkey"), True)],
        "revenue",
        out_col="cum_rev",
    ).localCheckpoint(eager=False)  # consumers: grand total + classed
    # the grand total is the MAX cumulative — read it from the prefix
    # pipeline's pinned output instead of re-running the lineitem
    # scan + per-part agg a second time (r9 review); the pin keeps the
    # prefix pipeline (and its offsets window) single-shot across both
    # consumers
    total = cum.agg(F.max("cum_rev").alias("total_rev"))
    classed = cum.crossJoin(F.broadcast(total)).withColumn(
        "abc_class",
        F.when(F.col("cum_rev") * 10 <= F.col("total_rev") * 8, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 95, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("revenue").cast("double").alias("class_revenue"),
            F.round(
                F.sum("revenue").cast("double")
                / F.max("total_rev").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


def _partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session+sf) a hive-partitioned dual of events
    under the warehouse dir, partitioned by event_date — the layout
    that turns a date-range scan into directory pruning at 100 TB.
    Token/marker logic shared with the bucketed-join layout
    (tables.layout_once)."""
    import shutil

    from flink_template_spark.tables import layout_once, layout_token, warehouse_dir

    path = f"{warehouse_dir(spark)}/part_events_{layout_token(sf_dir)}"

    def _build() -> None:
        shutil.rmtree(path, ignore_errors=True)
        (
            load_table(spark, sf_dir, "events")
            .withColumn("event_date", F.col("ts").cast("date"))
            .repartition("event_date")  # one file per partition dir
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(path)
        )

    layout_once(spark, sf_dir, "partitioned_events", _build)
    return path


_PRUNE_LO, _PRUNE_HI = "1995-03-01", "1995-03-31"


@register(
    "q_partition_pruned_scan",
    oracle=f"""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(ts AS DATE) >= DATE '{_PRUNE_LO}'
  AND CAST(ts AS DATE) <= DATE '{_PRUNE_HI}'
GROUP BY 1 ORDER BY 1
""",
)
def q_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning as a scan strategy: events are laid out
    hive-partitioned by event_date (written once per session — at
    100 TB this is the ingest layout, not a per-query cost), and a
    one-month readout touches ONLY that month's directories — the
    plan's PartitionFilters carry the date range while the row filter
    disappears entirely (plan-pinned in tests/test_plans.py). The
    oracle recomputes the same month from the unpartitioned table, so
    hash equality proves pruning lost no rows at the partition
    boundaries (the classic off-by-one-day bug)."""
    path = _partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("event_date") >= F.lit(_PRUNE_LO).cast("date"))
            & (F.col("event_date") <= F.lit(_PRUNE_HI).cast("date"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


_TE_SMOOTH = 20  # pseudo-observations pulled toward the global mean


@register(
    "q_target_encoding",
    oracle=f"""
WITH g AS (
  SELECT COUNT(*) AS gn,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gs
  FROM orders
),
c AS (
  SELECT o_orderpriority AS category, COUNT(*) AS cnt,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY 1
)
SELECT category,
  CAST(cnt AS BIGINT) AS n_orders,
  ROUND(CAST(s AS DOUBLE) / cnt, 6) AS raw_mean,
  ROUND((CAST(s AS DOUBLE) + {_TE_SMOOTH}.0 * (CAST(gs AS DOUBLE) / gn))
        / (cnt + {_TE_SMOOTH}.0), 6) AS encoded
FROM c CROSS JOIN g
ORDER BY category
""",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding — the leak-prone categorical
    feature every tabular-ML pipeline ships: each category's label
    mean shrunk toward the global mean with {_TE_SMOOTH}
    pseudo-observations, enc = (sum_cat + m*mu) / (n_cat + m), so
    rare categories don't memorize their few labels (the smoothing IS
    the regularizer; pair with q_train_test_split's hash split to
    keep the encoder fit on train only).

    Float discipline: both sums are exact DECIMAL(18,2) aggregates
    cast to double (correctly-rounded conversion, engine-identical);
    the shrinkage is one fixed IEEE dag, 6-dp rounded.

    Scale shape: ONE hash aggregation with map-side partials over the
    2-column pruned orders scan; the global mean is a broadcast
    scalar cross join — no shuffle beyond the |categories|-row agg."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    c = (
        orders.groupBy(F.col("o_orderpriority").alias("category"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dec).alias("s"))
        .localCheckpoint(eager=False)  # consumers: global totals + output
    )
    # the global totals are the category marginals re-summed — exact
    # decimal arithmetic, so deriving them from the pinned per-category
    # table (instead of a second orders scan) is bit-identical
    g = c.agg(F.sum("cnt").alias("gn"), F.sum("s").alias("gs"))
    mu = F.col("gs").cast("double") / F.col("gn")
    return (
        c.crossJoin(F.broadcast(g))
        .select(
            "category",
            F.col("cnt").cast("bigint").alias("n_orders"),
            F.round(F.col("s").cast("double") / F.col("cnt"), 6).alias(
                "raw_mean"
            ),
            F.round(
                (F.col("s").cast("double") + F.lit(float(_TE_SMOOTH)) * mu)
                / (F.col("cnt") + F.lit(float(_TE_SMOOTH))),
                6,
            ).alias("encoded"),
        )
        .orderBy("category")
    )


_RULES_TOP = 30


@register(
    "q_assoc_rules",
    oracle=f"""
WITH {_BASKET_CTE_SQL},
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, support,
         ia.cnt AS cnt_a
  FROM pairs JOIN item ia ON part_a = ia.p
  UNION ALL
  SELECT part_b, part_a, support, ib.cnt
  FROM pairs JOIN item ib ON part_b = ib.p
)
SELECT antecedent, consequent,
  CAST(support AS BIGINT) AS support,
  CAST(cnt_a AS BIGINT) AS cnt_antecedent,
  ROUND(CAST(support AS DOUBLE) / CAST(cnt_a AS DOUBLE), 6) AS confidence
FROM rules
ORDER BY confidence DESC, antecedent, consequent
LIMIT {_RULES_TOP}
""",
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules A=>B (apriori round 3, on top of
    q_basket_pairs' symmetric lift): confidence = supp(A,B)/supp(A),
    emitted for BOTH directions of every frequent pair — the rule
    form recommenders actually rank by, where conf(A=>B) and
    conf(B=>A) differ exactly when the items' popularities do.

    Scale shape: identical candidate bound to q_basket_pairs (pairs
    only from WITHIN an order — an equi-join on the order key, never
    a cartesian, pair volume <= sum basket_size^2); the direction
    fan-out is a 2x union of the POST-HAVING frequent-pair table
    (tiny); item supports join broadcast-small; the final
    top-{_RULES_TOP} is TakeOrderedAndProject on the 6-dp-rounded
    confidence with a (antecedent, consequent) total-order tiebreak,
    never a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    _, item, pairs = _frequent_part_pairs(li)
    # both rule directions consume the pair table: pin the (tiny)
    # post-HAVING result so the candidate join runs once
    pairs = pairs.localCheckpoint(eager=False)
    fwd = pairs.join(item.withColumnRenamed("p", "part_a"), "part_a").select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "support",
        F.col("cnt").alias("cnt_a"),
    )
    rev = pairs.join(item.withColumnRenamed("p", "part_b"), "part_b").select(
        F.col("part_b").alias("antecedent"),
        F.col("part_a").alias("consequent"),
        "support",
        F.col("cnt").alias("cnt_a"),
    )
    return (
        fwd.unionByName(rev)
        .select(
            "antecedent",
            "consequent",
            F.col("support").cast("bigint").alias("support"),
            F.col("cnt_a").cast("bigint").alias("cnt_antecedent"),
            F.round(
                F.col("support").cast("double") / F.col("cnt_a").cast("double"),
                6,
            ).alias("confidence"),
        )
        .orderBy(
            F.col("confidence").desc(), "antecedent", "consequent"
        )
        .limit(_RULES_TOP)
    )


_GINI_PRICE_SPLIT = 250000  # ~median o_totalprice: balanced binary label
# (tag, lab-column) per candidate feature; the explode AND the
# parent-totals filter both derive from this single tuple
_GINI_FEATURES = (
    ("priority", "f_priority"),
    ("status", "f_status"),
    ("weekday", "f_weekday"),
)
# engine-portable weekday: day-count since a fixed Monday, mod 7 — both
# engines do the same integer arithmetic (no locale/DOW-origin quirks)
_WD_SQL = "CAST((CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 7 AS VARCHAR)"


def _wd_spark():
    return (
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1992-01-01"))
        )
        % 7
    ).cast("string")


@register(
    "q_gini_split_scores",
    oracle=f"""
WITH lab AS (
  SELECT o_orderpriority AS f_priority, o_orderstatus AS f_status,
         {_WD_SQL} AS f_weekday,
         CASE WHEN o_totalprice > {_GINI_PRICE_SPLIT} THEN 1 ELSE 0 END AS y
  FROM orders
),
tall AS (
  SELECT 'priority' AS feature, f_priority AS v, y FROM lab
  UNION ALL SELECT 'status', f_status, y FROM lab
  UNION ALL SELECT 'weekday', f_weekday, y FROM lab
),
parent AS (SELECT COUNT(*) AS n, SUM(y) AS pos FROM lab),
byval AS (
  SELECT feature, v, COUNT(*) AS n_v, SUM(y) AS pos_v
  FROM tall GROUP BY 1, 2
),
agg AS (
  SELECT feature, COUNT(*) AS n_values,
    SUM((CAST(pos_v AS DOUBLE) * pos_v
         + CAST(n_v - pos_v AS DOUBLE) * (n_v - pos_v))
        / CAST(n_v AS DOUBLE)) AS purity
  FROM byval GROUP BY 1
)
SELECT feature,
  CAST(n_values AS BIGINT) AS n_values,
  ROUND(1.0 - purity / CAST(n AS DOUBLE), 6) AS weighted_gini,
  ROUND((1.0 - (CAST(pos AS DOUBLE) * pos
                + CAST(n - pos AS DOUBLE) * (n - pos))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        - (1.0 - purity / CAST(n AS DOUBLE)), 6) AS gini_gain
FROM agg CROSS JOIN parent
ORDER BY feature
""",
)
def q_gini_split_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split scoring: weighted Gini impurity and Gini
    gain of three candidate categorical features (order priority,
    status, engine-portable weekday) against a balanced binary label
    (o_totalprice > {_GINI_PRICE_SPLIT}) — the feature-selection
    primitive of every tree learner, and deliberately
    TRANSCENDENTAL-FREE (Gini over entropy: pure rational arithmetic
    on exact counts — the chi²-over-MI discipline, quality.py).

    Float discipline: weighted Gini is rewritten as
    1 - (1/N)·Σ_v (pos_v² + neg_v²)/n_v, so each per-value term is a
    fixed integer-product dag; the cross-value Σ is a double sum over
    ≤ |values| ≤ 7 terms (ulp-order noise, 6-dp rounded).

    Scale shape: ONE 3-column pruned scan feeds a 3-way tagged union
    (map-side; the single-scan tagged-explode pattern) into one hash
    agg with map-side partials — the per-(feature, value) table is
    |features|·|values| ≤ ~20 rows; parent totals broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    lab = orders.select(
        F.col("o_orderpriority").alias("f_priority"),
        F.col("o_orderstatus").alias("f_status"),
        _wd_spark().alias("f_weekday"),
        F.when(F.col("o_totalprice") > _GINI_PRICE_SPLIT, F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    tall = lab.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(tag).alias("feature"), F.col(col).alias("v")
                    )
                    for tag, col in _GINI_FEATURES
                ]
            )
        ).alias("fv"),
        "y",
    ).select("fv.feature", "fv.v", "y")
    byval = (
        tall.groupBy("feature", "v")
        .agg(F.count(F.lit(1)).alias("n_v"), F.sum("y").alias("pos_v"))
        .localCheckpoint(eager=False)  # consumers: parent totals + agg
    )
    # every feature partitions ALL rows (no NULL categories), so the
    # parent totals are any single feature's marginals re-summed —
    # exact integers off the pinned ≤20-row table, not a second scan
    # (the tag comes from the same _GINI_FEATURES tuple that built the
    # explode, so a feature rename can't silently NULL the totals)
    parent = byval.filter(F.col("feature") == _GINI_FEATURES[0][0]).agg(
        F.sum("n_v").alias("n"), F.sum("pos_v").alias("pos")
    )
    neg_v = F.col("n_v") - F.col("pos_v")
    term = (
        F.col("pos_v").cast("double") * F.col("pos_v")
        + neg_v.cast("double") * neg_v
    ) / F.col("n_v").cast("double")
    agg = byval.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_values"), F.sum(term).alias("purity")
    )
    nd = F.col("n").cast("double")
    parent_gini = F.lit(1.0) - (
        F.col("pos").cast("double") * F.col("pos")
        + (F.col("n") - F.col("pos")).cast("double") * (F.col("n") - F.col("pos"))
    ) / (nd * nd)
    weighted = F.lit(1.0) - F.col("purity") / nd
    return (
        agg.crossJoin(F.broadcast(parent))
        .select(
            "feature",
            F.col("n_values").cast("bigint").alias("n_values"),
            F.round(weighted, 6).alias("weighted_gini"),
            F.round(parent_gini - weighted, 6).alias("gini_gain"),
        )
        .orderBy("feature")
    )


# Cramér's-V column pairs: (tag, a-col, b-col) over the pri/st/wd
# projection. The first tag doubles as the grand-total derivation key.
_CV_PAIRS = (
    ("priority_x_status", "pri", "st"),
    ("priority_x_weekday", "pri", "wd"),
    ("status_x_weekday", "st", "wd"),
)

# Shared oracle CTE prefix: the tagged contingency cells + marginals +
# the grand total derived from _CV_PAIRS[0] (NOT a second orders scan).
# Used verbatim by BOTH q_cramers_v_matrix and q_mutual_info_pairs so
# the two statistics can never disagree on the table they describe.
_CV_CELLS_SQL = f"""cells AS MATERIALIZED (
  SELECT 'priority_x_status' AS pair, o_orderpriority AS va,
         o_orderstatus AS vb, COUNT(*) AS o
  FROM orders GROUP BY 2, 3
  UNION ALL
  SELECT 'priority_x_weekday', o_orderpriority, {_WD_SQL}, COUNT(*)
  FROM orders GROUP BY 2, 3
  UNION ALL
  SELECT 'status_x_weekday', o_orderstatus, {_WD_SQL}, COUNT(*)
  FROM orders GROUP BY 2, 3
),
ra AS (SELECT pair, va, SUM(o) AS ra FROM cells GROUP BY 1, 2),
cb AS (SELECT pair, vb, SUM(o) AS cb FROM cells GROUP BY 1, 2),
n AS (
  SELECT SUM(o) AS n FROM cells WHERE pair = '{_CV_PAIRS[0][0]}'
)"""


def _cv_cell_tables(spark: SparkSession, sf_dir: str):
    """Shared contingency machinery for q_cramers_v_matrix and
    q_mutual_info_pairs: ONE 3-column pruned orders scan feeds a
    3-way tagged explode into one hash agg; returns (cells, ra, cb, n)
    where cells is checkpoint-pinned for its multiple consumers and n
    derives from _CV_PAIRS[0]'s cells (never a second orders scan)."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
        _wd_spark().alias("wd"),
    )
    tagged = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(tag).alias("pair"),
                        F.col(a).alias("va"),
                        F.col(b).alias("vb"),
                    )
                    for tag, a, b in _CV_PAIRS
                ]
            )
        ).alias("x")
    ).select("x.pair", "x.va", "x.vb")
    cells = (
        tagged.groupBy("pair", "va", "vb")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    ra = cells.groupBy("pair", "va").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("pair", "vb").agg(F.sum("o").alias("cb"))
    n = (
        cells.filter(F.col("pair") == _CV_PAIRS[0][0])
        .agg(F.sum("o").alias("n"))
    )
    return cells, ra, cb, n


@register(
    "q_cramers_v_matrix",
    oracle=f"""
WITH {_CV_CELLS_SQL},
dims AS (
  SELECT pair, COUNT(DISTINCT va) AS r, COUNT(DISTINCT vb) AS c
  FROM cells GROUP BY 1
),
terms AS (
  SELECT cells.pair,
    (CAST(o AS DOUBLE)
      - (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)) / CAST(n AS DOUBLE))
    * (CAST(o AS DOUBLE)
      - (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)) / CAST(n AS DOUBLE))
    / ((CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)) / CAST(n AS DOUBLE)) AS term
  FROM cells
  JOIN ra ON cells.pair = ra.pair AND cells.va = ra.va
  JOIN cb ON cells.pair = cb.pair AND cells.vb = cb.vb
  CROSS JOIN n
),
chi AS (SELECT pair, SUM(term) AS chi2 FROM terms GROUP BY 1)
SELECT chi.pair,
  ROUND(chi2, 6) AS chi2,
  CAST(r AS BIGINT) AS n_rows_cat,
  CAST(c AS BIGINT) AS n_cols_cat,
  CASE WHEN LEAST(r - 1, c - 1) = 0 THEN CAST(NULL AS DOUBLE)
       ELSE ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * LEAST(r - 1, c - 1))), 6)
  END AS cramers_v
FROM chi JOIN dims ON chi.pair = dims.pair CROSS JOIN n
ORDER BY chi.pair
""",
)
def q_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association matrix over categorical column pairs of
    ``orders`` — the data-profiling pass that flags redundant or
    leaking categoricals before training (V ≈ 0: independent; V ≈ 1:
    one column determines the other). chi² over the 2-way contingency
    table, normalized by N·min(r−1, c−1); sqrt is IEEE-exact, so the
    only inexactness is the ≤ |r·c| ≤ 35-term double sum (6-dp
    rounded) — transcendental-free like q_chi2_terms.

    Scale shape: ONE 3-column pruned scan feeds a 3-way tagged
    explode into one hash agg; every downstream table (cells,
    marginals, dims) is bounded by |categories|² per pair, never
    data-sized; the cell table is checkpoint-pinned once for its four
    consumers (cells/ra/cb/dims), and N broadcasts."""
    cells, ra, cb, n = _cv_cell_tables(spark, sf_dir)
    dims = cells.groupBy("pair").agg(
        F.count_distinct("va").alias("r"), F.count_distinct("vb").alias("c")
    )
    e = (F.col("ra").cast("double") * F.col("cb").cast("double")) / F.col(
        "n"
    ).cast("double")
    od = F.col("o").cast("double")
    terms = (
        cells.join(ra, ["pair", "va"])
        .join(cb, ["pair", "vb"])
        .crossJoin(F.broadcast(n))
        .select("pair", ((od - e) * (od - e) / e).alias("term"))
    )
    chi = terms.groupBy("pair").agg(F.sum("term").alias("chi2"))
    return (
        chi.join(F.broadcast(dims), "pair")
        .crossJoin(F.broadcast(n))
        .select(
            "pair",
            F.round(F.col("chi2"), 6).alias("chi2"),
            F.col("r").cast("bigint").alias("n_rows_cat"),
            F.col("c").cast("bigint").alias("n_cols_cat"),
            # a single-category column makes min(r-1, c-1) zero: V is
            # undefined (NULL), and Spark's ANSI divide would throw
            # where DuckDB NULLs — guard explicitly in both engines
            F.when(
                F.least(F.col("r") - 1, F.col("c") - 1) == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n").cast("double")
                            * F.least(F.col("r") - 1, F.col("c") - 1)
                        )
                    ),
                    6,
                )
            )
            .alias("cramers_v"),
        )
        .orderBy("pair")
    )


_DBS_EPS = 150  # DBSCAN eps (integer grid units; 10× the pair-join radius)
_DBS_MINPTS = 4  # core threshold, count INCLUDING the point itself


def _dbscan_oracle() -> str:
    return f"""
WITH pts AS MATERIALIZED (
  {_geo_pts_cte()}
),
nbr AS MATERIALIZED (
  SELECT a.id AS id, b.id AS nid
  FROM pts a JOIN pts b
    ON a.id <> b.id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {_DBS_EPS * _DBS_EPS}
),
cnt AS (
  SELECT p.id, COALESCE(n.c, 0) AS nn
  FROM pts p LEFT JOIN (SELECT id, COUNT(*) AS c FROM nbr GROUP BY id) n
    ON p.id = n.id
),
cores AS (SELECT id FROM cnt WHERE nn + 1 >= {_DBS_MINPTS}),
brd AS (
  SELECT DISTINCT nbr.id FROM nbr JOIN cores ON nbr.nid = cores.id
)
SELECT cnt.id,
  CAST(nn AS BIGINT) AS n_neighbors,
  CASE WHEN cnt.id IN (SELECT id FROM cores) THEN 'core'
       WHEN cnt.id IN (SELECT id FROM brd) THEN 'border'
       ELSE 'noise' END AS label
FROM cnt
ORDER BY cnt.id
"""


@register("q_dbscan_core_points", oracle=_dbscan_oracle())
def q_dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density classification (core / border / noise) over the
    deterministic portable-hash point cloud — the density-based
    outlier/cluster primitive, and the expensive half of full DBSCAN
    (the remaining step, connected components over core-core edges, is
    exactly operators.components, already verified by
    q_near_dup_components). eps = _DBS_EPS (150) units, minPts =
    _DBS_MINPTS (4) (count includes the point): a point with >= 3
    eps-neighbors is core; a non-core point eps-adjacent to a core is
    border; the rest is noise. The three SFs sweep the density regime
    (sparse → mostly noise at sf0.001, mixed at sf0.01, dense →
    mostly core at sf0.1).

    Scale shape: neighbors come from the grid-bucketed radius
    self-join (cell + 3×3 neighborhood equi-join — candidates bounded
    by local density, never all-pairs; the oracle IS the quadratic
    brute join); the symmetric neighbor list is pinned once for its
    two consumers (counts + border reach); core ids broadcast into
    the border semi-join. Integer arithmetic end-to-end."""
    from flink_template_spark.operators.spatial import radius_self_join

    cust = load_table(spark, sf_dir, "customer")
    pts = _geo_points(cust).localCheckpoint(
        eager=False
    )  # consumers: radius join + left base
    # pin the radius join itself: BOTH branches of the symmetrizing
    # union consume it, and the grid join (9× cell expansion +
    # distance verify) is the dominant cost — without the pin it
    # would execute once per branch
    pairs = (
        radius_self_join(pts, _DBS_EPS)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sym = (
        pairs.unionByName(
            pairs.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        .withColumnRenamed("id_a", "id")
        .withColumnRenamed("id_b", "nid")
        .localCheckpoint(eager=False)  # consumers: counts + border reach
    )
    cnt = (
        pts.select("id")
        .join(sym.groupBy("id").agg(F.count(F.lit(1)).alias("nn")), "id", "left")
        .select("id", F.coalesce("nn", F.lit(0)).alias("nn"))
    )
    cores = cnt.filter(F.col("nn") + 1 >= _DBS_MINPTS).select("id")
    border = (
        sym.join(
            F.broadcast(cores.withColumnRenamed("id", "nid")), "nid", "left_semi"
        )
        .select("id")
        .distinct()
    )
    return (
        cnt.join(
            F.broadcast(cores.withColumn("is_core", F.lit(True))), "id", "left"
        )
        .join(
            F.broadcast(border.withColumn("is_border", F.lit(True))),
            "id",
            "left",
        )
        .select(
            "id",
            F.col("nn").cast("bigint").alias("n_neighbors"),
            F.when(F.col("is_core"), "core")
            .when(F.col("is_border"), "border")
            .otherwise("noise")
            .alias("label"),
        )
        .orderBy("id")
    )


_TRIPLE_TOP = 15


@register(
    "q_itemsets_3",
    oracle=f"""
WITH {_BASKET_CTE_SQL},
cand AS (
  SELECT p1.part_a, p1.part_b, p2.part_b AS part_c
  FROM pairs p1
  JOIN pairs p2 ON p1.part_a = p2.part_a AND p2.part_b > p1.part_b
  WHERE EXISTS (SELECT 1 FROM pairs p3
                WHERE p3.part_a = p1.part_b AND p3.part_b = p2.part_b)
),
tri AS (
  SELECT c.part_a, c.part_b, c.part_c, COUNT(*) AS support
  FROM cand c
  JOIN d a ON a.p = c.part_a
  JOIN d b ON b.o = a.o AND b.p = c.part_b
  JOIN d e ON e.o = a.o AND e.p = c.part_c
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {_BASKET_MINSUP}
)
SELECT part_a, part_b, part_c, CAST(support AS BIGINT) AS support
FROM tri
ORDER BY support DESC, part_a, part_b, part_c
LIMIT {_TRIPLE_TOP}
""",
)
def q_itemsets_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets with the FULL textbook apriori prune
    (round 3 proper, on top of q_basket_pairs/q_assoc_rules):
    candidates are the self-join of the frequent-pair table on its
    first item — (a,b) ⋈ (a,c), b < c — kept only when the third
    2-subset (b,c) is ALSO frequent, so every 2-subset of every
    candidate is frequent before any basket is touched (the
    anti-monotonicity prune in its strong form); only then are
    candidates counted against the baskets and HAVING-filtered. At
    the synthetic SFs the level-3 support honestly thins from 94
    triples at sf0.001 to 0 at sf0.1 as the part space outgrows the
    basket count. Integer counts end-to-end.

    Scale shape: candidate generation touches ONLY the tiny
    post-HAVING pair table (self-join on the shared first item +
    a semi-join prune — never the corpus); the support count joins
    the candidate list to the basket table by part/order keys,
    volume bounded by Σ_o |candidates ⊆ o|; the
    top-{_TRIPLE_TOP} is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    d, _, pairs = _frequent_part_pairs(li)
    # candidate generation consumes the pair table three times
    # (both self-join sides + the (b,c)-frequency semi-join): pin it
    pairs = pairs.select("part_a", "part_b").localCheckpoint(eager=False)
    cand = (
        pairs.join(
            pairs.select(
                "part_a", F.col("part_b").alias("part_c")
            ),
            "part_a",
        )
        .filter(F.col("part_c") > F.col("part_b"))
        .join(
            pairs.select(
                F.col("part_a").alias("part_b"),
                F.col("part_b").alias("part_c"),
            ),
            ["part_b", "part_c"],
            "left_semi",
        )
    )
    da = d.select(F.col("o"), F.col("p").alias("part_a"))
    db = d.select(F.col("o"), F.col("p").alias("part_b"))
    dc = d.select(F.col("o"), F.col("p").alias("part_c"))
    tri = (
        cand.join(da, "part_a")
        .join(db, ["o", "part_b"])
        .join(dc, ["o", "part_c"])
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MINSUP)
    )
    return (
        tri.select(
            "part_a",
            "part_b",
            "part_c",
            F.col("support").cast("bigint").alias("support"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b", "part_c")
        .limit(_TRIPLE_TOP)
    )


@register(
    "q_mutual_info_pairs",
    oracle=f"""
WITH {_CV_CELLS_SQL},
mi AS (
  SELECT cells.pair,
    SUM(CAST(ROUND(
      (CAST(o AS DOUBLE) / n)
        * LN(CAST(o AS DOUBLE) * n / (CAST(ra AS DOUBLE) * cb))
      * 10000000.0, 0) AS BIGINT)) AS sq
  FROM cells
  JOIN ra ON cells.pair = ra.pair AND cells.va = ra.va
  JOIN cb ON cells.pair = cb.pair AND cells.vb = cb.vb
  CROSS JOIN n
  GROUP BY 1
),
ha AS (
  SELECT pair,
    SUM(CAST(ROUND(
      -(CAST(ra AS DOUBLE) / n) * LN(CAST(ra AS DOUBLE) / n)
      * 10000000.0, 0) AS BIGINT)) AS hq
  FROM ra CROSS JOIN n GROUP BY 1
),
hb AS (
  SELECT pair,
    SUM(CAST(ROUND(
      -(CAST(cb AS DOUBLE) / n) * LN(CAST(cb AS DOUBLE) / n)
      * 10000000.0, 0) AS BIGINT)) AS hq
  FROM cb CROSS JOIN n GROUP BY 1
)
SELECT mi.pair,
  ROUND(CAST(mi.sq AS DOUBLE) / 10000000.0, 6) AS mi_nats,
  ROUND(CAST(ha.hq AS DOUBLE) / 10000000.0, 6) AS h_a,
  ROUND(CAST(hb.hq AS DOUBLE) / 10000000.0, 6) AS h_b,
  CASE WHEN ha.hq = 0 OR hb.hq = 0 THEN CAST(NULL AS DOUBLE)
       ELSE ROUND(CAST(mi.sq AS DOUBLE)
                  / SQRT(CAST(ha.hq AS DOUBLE) * CAST(hb.hq AS DOUBLE)), 6)
  END AS nmi
FROM mi JOIN ha ON mi.pair = ha.pair JOIN hb ON mi.pair = hb.pair
ORDER BY mi.pair
""",
)
def q_mutual_info_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) + marginal entropies + normalized MI
    for the same categorical column pairs as q_cramers_v_matrix — the
    information-theoretic association measure beside chi²'s
    frequentist one (MI sees any dependence; NMI = MI/√(H_a·H_b) puts
    it on [0,1] with a NULL guard for zero-entropy columns).

    Float discipline: all counts are exact integers; every (o/n)·ln(…)
    term — cell and marginal alike — is fixed-point-quantized (×1e7 →
    bigint) before summing so the per-pair totals are exact in any
    partition order (the q_unigram_logprob discipline; the zero-guard
    compares the exact integer entropy, not a float).

    Scale shape: same as Cramér's V — ONE 3-column pruned scan, a
    3-way tagged explode into one hash agg; cells, marginals and the
    grand total all live on the checkpoint-pinned cell table, bounded
    by |categories|² per pair."""
    cells, ra, cb, n = _cv_cell_tables(spark, sf_dir)
    od = F.col("o").cast("double")
    nd = F.col("n")
    mi_term = F.round(
        (od / nd)
        * F.log(od * nd / (F.col("ra").cast("double") * F.col("cb")))
        * 10000000.0,
        0,
    ).cast("bigint")
    mi = (
        cells.join(ra, ["pair", "va"])
        .join(cb, ["pair", "vb"])
        .crossJoin(F.broadcast(n))
        .groupBy("pair")
        .agg(F.sum(mi_term).alias("sq"))
    )

    def _entropy(marg, col):
        md = F.col(col).cast("double")
        q = F.round(-(md / nd) * F.log(md / nd) * 10000000.0, 0).cast(
            "bigint"
        )
        return (
            marg.crossJoin(F.broadcast(n))
            .groupBy("pair")
            .agg(F.sum(q).alias("hq"))
        )

    ha = _entropy(ra, "ra").select("pair", F.col("hq").alias("ha_q"))
    hb = _entropy(cb, "cb").select("pair", F.col("hq").alias("hb_q"))
    return (
        mi.join(F.broadcast(ha), "pair")
        .join(F.broadcast(hb), "pair")
        .select(
            "pair",
            F.round(F.col("sq").cast("double") / 10000000.0, 6).alias(
                "mi_nats"
            ),
            F.round(F.col("ha_q").cast("double") / 10000000.0, 6).alias(
                "h_a"
            ),
            F.round(F.col("hb_q").cast("double") / 10000000.0, 6).alias(
                "h_b"
            ),
            F.when(
                (F.col("ha_q") == 0) | (F.col("hb_q") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.col("sq").cast("double")
                    / F.sqrt(
                        F.col("ha_q").cast("double")
                        * F.col("hb_q").cast("double")
                    ),
                    6,
                )
            )
            .alias("nmi"),
        )
        .orderBy("pair")
    )


# ---------------------------------------------------------------------------
# Hilbert-curve layout: the locality-tighter sibling of Z-order
# ---------------------------------------------------------------------------


def _hilbert_oracle() -> str:
    from flink_template_spark.functions.zorder import hilbert_steps_sql

    steps = hilbert_steps_sql("qx", "qy", _Z_BITS, "q")
    return f"""
WITH q AS (
  SELECT
    CAST(floor(l_extendedprice / {_Z_PRICE_BUCKET}) AS BIGINT) AS qx,
    CAST(floor(l_quantity) - 1 AS BIGINT) AS qy,
    l_extendedprice, l_quantity
  FROM lineitem
),
{steps}
SELECT hd // {1 << _Z_PARTS_SHIFT} AS pid,
  COUNT(*) AS n_rows,
  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
FROM h0
GROUP BY 1
ORDER BY pid
"""


@register("q_hilbert_layout", oracle=_hilbert_oracle())
def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout audit (functions.zorder.hilbert_index):
    q_zorder_layout's exact twin — same quantized (price, quantity)
    64×64 grid, same 16 top-bit partitions, same per-partition bounds
    readout — but keyed by the Hilbert index instead of the Morton
    interleave. Hilbert's adjacency guarantee (consecutive indices are
    always neighboring cells; Morton jumps at tile seams) gives equal-
    size curve segments tighter average bounding boxes, which is why
    newer lakehouse clustering moved from Z-order to Hilbert — having
    BOTH layouts behind one audit shape lets a table owner A/B the
    skipping bounds on their own key distribution before rewriting
    100 TB. The index is the 4-state LUT DFA over original bit pairs
    (functions.zorder.hilbert_index — linear expression tree; the
    textbook coordinate-mutation transliteration cost ~22 s of
    driver-side codegen), bit-identical cross-engine — pinned against
    the classic xy2d reference and the adjacency property in tests.

    Scale shape: map-only key computation riding the 2-column pruned
    scan into a 16-row hash agg with map-side partials — identical to
    the Z-order plan."""
    from flink_template_spark.functions.zorder import hilbert_index

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    qx = F.floor(F.col("l_extendedprice") / F.lit(_Z_PRICE_BUCKET))
    qy = F.floor(F.col("l_quantity")) - F.lit(1)
    hkey = hilbert_index(qx, qy, _Z_BITS)
    return (
        li.select(
            F.shiftright(hkey, _Z_PARTS_SHIFT).alias("pid"),
            "l_quantity",
            "l_extendedprice",
        )
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("pid")
    )
