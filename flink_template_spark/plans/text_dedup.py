"""Dedup + text-analysis queries over ``documents`` (LLM-data-pipeline
operators; SURVEY.md §2.7 north-star extensions).

Every sketch here (MinHash, LSH pairs, SimHash, Jaccard) is
oracle-checked, not rows-only: the DuckDB SQL is *generated from the
same constants* as the Spark expressions (functions.hashing), so the
signatures must agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_template_spark.functions.hashing import (
    LSH_BANDS,
    MERSENNE_P,
    NUM_HASHES,
    ROWS_PER_BAND,
    md5int_duckdb,
    md5int_spark,
    minhash_expr,
)
from flink_template_spark.functions.text import (
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
)
from flink_template_spark.operators.components import near_dup_components
from flink_template_spark.operators.dedup import (
    exact_dup_groups,
    jaccard_prefix_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_hamming_pairs,
    simhash_signatures,
)
from flink_template_spark.plans.datapipe import _split_sql as _dd_split_sql
from flink_template_spark.plans.registry import register
from flink_template_spark.memo import SessionLRUMemo
from flink_template_spark.tables import load_table

# DuckDB CTE: distinct (doc_id, shingle) for n-word shingles, 1-based lists.
def _duck_shingles(n: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {n - 2}), i -> {parts})) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  )
"""


@register(
    "q_dedup_exact_docs",
    oracle="""
SELECT text, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
""",
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs)


_MH_AGGS_DUCK = ",\n  ".join(
    f"MIN({minhash_expr(i, 'h')}) AS mh_{i}" for i in range(NUM_HASHES)
)

@register(
    "q_minhash_signatures",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
)
SELECT doc_id,
  {_MH_AGGS_DUCK}
FROM hashed
GROUP BY doc_id
""",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs)


_BAND_KEYS_DUCK = ",\n    ".join(
    "CONCAT_WS('_', "
    + ", ".join(
        f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )
    + f") AS band_key_{b}"
    for b in range(LSH_BANDS)
)
_BAND_UNION_DUCK = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, band_key_{b} AS band_key FROM sigs"
    for b in range(LSH_BANDS)
)

@register(
    "q_minhash_lsh_pairs",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
),
sig0 AS (
  SELECT doc_id, {_MH_AGGS_DUCK} FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_BAND_KEYS_DUCK} FROM sig0
),
bands AS (
  {_BAND_UNION_DUCK}
)
SELECT
  a.doc_id AS id_a,
  b.doc_id AS id_b,
  COUNT(*) AS n_shared_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
""",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs)


_SIMHASH_BITSUMS_DUCK = ",\n  ".join(
    f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN cnt ELSE -cnt END) AS s_{b}"
    for b in range(32)
)
_SIMHASH_COMBINE_DUCK = " + ".join(
    f"CASE WHEN s_{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END" for b in range(32)
)

_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
counted AS (
  SELECT doc_id, token, COUNT(*) AS cnt, {md5int_duckdb('token')} AS h
  FROM tok GROUP BY doc_id, token
),
bitsums AS (
  SELECT doc_id,
  {_SIMHASH_BITSUMS_DUCK}
  FROM counted GROUP BY doc_id
)
SELECT doc_id, {_SIMHASH_COMBINE_DUCK} AS simhash
FROM bitsums
"""


@register("q_simhash_signatures", oracle=_SIMHASH_ORACLE)
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs)


@register("q_simhash_scalar", oracle=_SIMHASH_ORACLE)
def q_simhash_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-only (per-row, shuffle-free) SimHash dual — same
    oracle as the grouped pipeline, so the identity between the two
    formulations is machine-checked, and the signature the STREAMING
    near-dup dedup keys on (streaming.windows.dedup_near_stream) is
    pinned to the batch-audited one."""
    from flink_template_spark.operators.dedup import simhash_scalar

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash_scalar("text").alias("simhash"))


@register(
    "q_simhash_hamming_pairs",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
counted AS (
  SELECT doc_id, token, COUNT(*) AS cnt, {md5int_duckdb('token')} AS h
  FROM tok GROUP BY doc_id, token
),
bitsums AS (
  SELECT doc_id,
  {_SIMHASH_BITSUMS_DUCK}
  FROM counted GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_SIMHASH_COMBINE_DUCK} AS simhash FROM bitsums
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-blocking SimHash near-dup (exact by pigeonhole: hamming ≤ 3
    with 4 bands ⇒ ≥1 identical band). The oracle is the brute-force
    all-pairs scan — identical output, quadratic cost the Spark plan
    avoids."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_hamming_pairs(docs, max_hamming=3)


@register(
    "q_ngram_jaccard_pairs",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT
  id_a, id_b, n_inter,
  ROUND(CAST(n_inter AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.id_a = sa.doc_id
JOIN sizes sb ON inter.id_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
      >= 0.4999995
""",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5)


# shared with q_dup_cluster_sizes: the full edge-build + recursive
# connected-components fixpoint, exposing `cc` (node, component) and
# `sized` (component, cluster_size)
_COMPONENTS_CTE = f"""
WITH RECURSIVE
sh AS ({_duck_shingles(3)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
        >= 0.4999995
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
cc AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
),
sized AS (
  SELECT component, COUNT(*) AS cluster_size FROM cc GROUP BY component
)"""


# Four queries consume the same near-dup components table
# (q_near_dup_components, q_dup_cluster_sizes, q_best_of_cluster,
# q_leakage_safe_split); before r8 each re-ran the full shingle-pair
# edge build PLUS the iterative label-propagation fixpoint independently
# (VERDICT r7 what's-wrong: q_leakage_safe_split's 7.4 s wall was mostly
# this recompute). The memo materializes the fixpoint once per
# (session, sf_dir) — the `_TRADE_EDGES_MEMO` pattern (plans/graph.py).
# At 100 TB this is the cluster-assignment parquet a dedup pipeline
# writes once and every downstream consumer (keeper filter, histogram,
# split assignment) reads. localCheckpoint, not persist: the fixpoint's
# lineage is max_iter joins deep, and consumers re-reference the table
# (join + agg), so truncating the lineage to the materialized blocks is
# what makes the warm serves cheap.
_COMPONENTS_MEMO = SessionLRUMemo("near_dup_components", max_entries=4)


def _near_dup_components_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component, cluster_size, is_keeper) — the Spark dual of
    _COMPONENTS_CTE, memoized per (applicationId, sf_dir)."""

    def _build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
        # eager=True is DELIBERATE (ADVICE r8): the label-propagation
        # fixpoint inside near_dup_components is inherently eager (it
        # counts per round to detect convergence), so plan construction
        # pays the full edge+fixpoint job no matter what; eager=False
        # would only defer the final cheap sizes-join while leaving a
        # surprise job inside the first consumer's action. Materializing
        # here makes get_or_build the ONE place the build cost lives —
        # the recorded serve cost of every consumer is then pure reads.
        return near_dup_components(docs, pairs).localCheckpoint(eager=True)

    key = (spark.sparkContext.applicationId, sf_dir)
    return _COMPONENTS_MEMO.get_or_build(key, _build)


@register(
    "q_near_dup_components",
    oracle=f"""{_COMPONENTS_CTE}
SELECT cc.node AS doc_id, cc.component, sized.cluster_size,
       cc.node = cc.component AS is_keeper
FROM cc JOIN sized USING (component)
""",
)
def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: Jaccard-pair edges → connected
    components (iterative min-label propagation) → canonical keeper per
    cluster. The oracle computes the same fixpoint with a recursive CTE —
    component = min reachable doc_id is engine-independent. Serves
    from the memoized components table (built once per session+sf)."""
    return _near_dup_components_table(spark, sf_dir)


@register(
    "q_text_stats_by_lang",
    oracle="""
SELECT
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens_ws,
  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
       AS DOUBLE) / COUNT(*) AS avg_tokens_bpe
FROM documents
GROUP BY lang
""",
)
def q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (F.sum(token_count_ws(t)).cast("double") / F.count(F.lit(1))).alias(
            "avg_tokens_ws"
        ),
        (F.sum(token_count_bpe(t)).cast("double") / F.count(F.lit(1))).alias(
            "avg_tokens_bpe"
        ),
    )


@register(
    "q_quality_scores",
    oracle="""
SELECT
  doc_id,
  length(text) AS n_chars_live,
  len(string_split(text, ' ')) AS n_tokens,
  ROUND(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))
        AS DOUBLE) / len(string_split(text, ' ')), 6) AS stop_ratio,
  ROUND(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS punct_ratio,
  ROUND(
    0.5 * LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
    + 0.5 * LEAST(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))
        AS DOUBLE) / len(string_split(text, ' ')) * 10.0, 1.0)
    - 0.25 * (CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
        / length(text)),
  6) AS quality
FROM documents
""",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_live"),
        token_count_ws(t).alias("n_tokens"),
        F.round(stopword_ratio(t), 6).alias("stop_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        quality_score(t).alias("quality"),
    )


@register(
    "q_lang_guess_confusion",
    oracle="""
WITH guessed AS (
  SELECT
    lang,
    CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))
              AS DOUBLE) / len(string_split(text, ' ')) >= 0.04
         THEN 'en' ELSE 'unknown' END AS guess
  FROM documents
)
SELECT lang, guess, COUNT(*) AS n_docs
FROM guessed GROUP BY lang, guess
""",
)
def q_lang_guess_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic + confusion matrix against the
    labeled ``lang`` column. (The corpus is synthetic word-salad, so the
    heuristic's accuracy is incidental — the operator shape is the point:
    per-doc classify, then grouped confusion counts.)"""
    docs = load_table(spark, sf_dir, "documents")
    guess = F.when(stopword_ratio(F.col("text")) >= 0.04, "en").otherwise("unknown")
    return (
        docs.select("lang", guess.alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q_doc_fingerprints",
    oracle=f"""
WITH sh AS ({_duck_shingles(4)}),
fp AS (
  SELECT doc_id, MIN({md5int_duckdb('shingle')}) AS fp_min
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id, md5(d.text) AS md5_full, fp.fp_min
FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
""",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash-style fingerprint: min 32-bit hash over 4-word
    shingles (winnowing-lite) + full md5."""
    from flink_template_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs, 4)
    fp = sh.groupBy("doc_id").agg(
        F.min(F.expr(md5int_spark("shingle"))).alias("fp_min")
    )
    return (
        docs.select("doc_id", F.md5("text").alias("md5_full"))
        .join(fp, "doc_id", "left")
        .select("doc_id", "md5_full", "fp_min")
    )


@register(
    "q_fuzzy_name_pairs",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
  levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
WHERE a.c_custkey <= 100 AND b.c_custkey <= 100
  AND a.c_nationkey = b.c_nationkey
  AND levenshtein(a.c_name, b.c_name) <= 2
ORDER BY id_a, id_b
""",
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution shape): same-
    nation candidate pairs filtered by levenshtein ≤ 2. The nation
    equi-key keeps the pair join blocked (never all-pairs) — the
    standard blocking-key pattern at scale."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 2)
        .select("id_a", "id_b", "edit_dist")
        .orderBy("id_a", "id_b")
    )


@register(
    "q_top_terms_per_lang",
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
),
counted AS (
  SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token
),
ranked AS (
  SELECT lang, token, n,
    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
  FROM counted
)
SELECT lang, token, n, rk FROM ranked WHERE rk <= 5
""",
)
def q_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: per-lang top-5 terms. explode → two-key
    count (partial agg absorbs the token fan-out map-side) → per-lang
    top-k window. At 100 TB the (lang, token) count is the only shuffle
    that carries data; the window input is already one row per distinct
    term."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
    counted = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.desc("n"), "token")
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "token", "n", "rk")
    )


@register(
    "q_best_of_cluster",
    oracle=f"""{_COMPONENTS_CTE},
scored AS (
  SELECT cc.component, d.doc_id,
    ROUND(
      0.5 * LEAST(CAST(length(d.text) AS DOUBLE) / 500.0, 1.0)
      + 0.5 * LEAST(CAST(len(list_filter(string_split(d.text, ' '), t -> t IN ('the', 'a')))
          AS DOUBLE) / len(string_split(d.text, ' ')) * 10.0, 1.0)
      - 0.25 * (CAST(length(regexp_replace(d.text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / length(d.text)),
    6) AS quality
  FROM cc JOIN documents d ON cc.node = d.doc_id
),
ranked AS (
  SELECT component, doc_id, quality,
    COUNT(*) OVER (PARTITION BY component) AS cluster_size,
    ROW_NUMBER() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) AS rk
  FROM scored
)
SELECT component, doc_id AS keeper_doc_id, quality, cluster_size
FROM ranked WHERE rk = 1
""",
)
def q_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: near-dup clusters (connected
    components over Jaccard edges) reduced to their highest-quality
    member — the keep-the-best dedup policy (vs keep-min-id in
    q_near_dup_components). The quality ordering is the rounded score,
    identical across engines, so the argmax is deterministic. Clusters
    come from the memoized components table (built once per
    session+sf)."""
    docs = load_table(spark, sf_dir, "documents")
    cc = _near_dup_components_table(spark, sf_dir).select("doc_id", "component")
    scored = cc.join(
        docs.select("doc_id", quality_score(F.col("text")).alias("quality")),
        "doc_id",
    )
    w = W.partitionBy("component")
    rk = W.partitionBy("component").orderBy(F.desc("quality"), "doc_id")
    return (
        scored.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keeper_doc_id"),
            "quality",
            "cluster_size",
        )
    )


CHUNK_TOKENS = 50
CHUNK_STRIDE = 25


@register(
    "q_doc_chunks",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
starts AS (
  SELECT doc_id, w, unnest(range(0, len(w), {CHUNK_STRIDE})) AS chunk_start
  FROM d
)
SELECT
  doc_id,
  CAST(chunk_start / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
  CAST(chunk_start AS BIGINT) AS chunk_start,
  CAST(len(list_slice(w, chunk_start + 1, chunk_start + {CHUNK_TOKENS}))
       AS INTEGER) AS n_chunk_tokens,
  array_to_string(
    list_slice(w, chunk_start + 1, chunk_start + {CHUNK_TOKENS}), ' '
  ) AS chunk_text
FROM starts
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG / context-window prep):
    each doc explodes into ceil(n/stride) chunks of ≤CHUNK_TOKENS tokens
    at CHUNK_STRIDE offsets. Pure expressions — tokenize once, generate
    start offsets with ``sequence``, slice per chunk; the explode's
    fan-out is bounded by tokens/stride and never shuffles (chunking is
    map-side; only a downstream consumer would)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select("doc_id", toks.alias("w"))
    starts = d.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(0), F.size("w") - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_start"),
    )
    sliced = F.slice(F.col("w"), F.col("chunk_start") + 1, CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        (F.col("chunk_start") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.size(sliced).alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


@register(
    "q_tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
    ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tfidf, rk FROM ranked WHERE rk <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by TF-IDF. Shuffle ledger at scale: one
    (doc, token) count, one token DF count (broadcast back — |vocab| ≪
    corpus), a 1-row N broadcast, one per-doc window. Rounded to 6 dp —
    far above libm ln() ulp skew — so the ordering and values are
    engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf", "rk")
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check: train-split documents sharing word
# shingles with eval-split documents — the leakage audit every training
# corpus needs before a benchmark score means anything.
#
# Scale design: the shingle join is the classic hot-key trap (stopword
# trigrams appear in a huge share of docs), so shingles are first
# document-frequency-filtered (df <= DF_CAP) — frequent shingles carry
# no contamination signal and capping df bounds the join's per-key
# fan-out at DF_CAP², independent of corpus size. One shuffle to count
# df, one semi-join-shaped equi-join on the surviving shingles.
# ---------------------------------------------------------------------------

_CONTAM_DF_CAP = 50
_CONTAM_MIN_SHARED = 2


@register(
    "q_contamination_check",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
lab AS (
  SELECT doc_id, {_dd_split_sql()} AS split FROM documents
),
sh2 AS (
  SELECT s.doc_id, s.shingle, l.split FROM sh s JOIN lab l ON s.doc_id = l.doc_id
),
keep AS (
  SELECT shingle FROM sh2 GROUP BY shingle
  HAVING COUNT(DISTINCT doc_id) <= {_CONTAM_DF_CAP}
),
tr AS (
  SELECT doc_id AS train_id, shingle FROM sh2
  WHERE split = 'train' AND shingle IN (SELECT shingle FROM keep)
),
ev AS (
  SELECT doc_id AS eval_id, shingle FROM sh2
  WHERE split <> 'train' AND shingle IN (SELECT shingle FROM keep)
)
SELECT train_id, eval_id, COUNT(*) AS n_shared
FROM tr JOIN ev ON tr.shingle = ev.shingle
GROUP BY train_id, eval_id
HAVING COUNT(*) >= {_CONTAM_MIN_SHARED}
ORDER BY n_shared DESC, train_id, eval_id
""",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_template_spark.operators.dedup import shingle_rows
    from flink_template_spark.plans.datapipe import split_of

    docs = load_table(spark, sf_dir, "documents").withColumn("split", split_of())
    # r12 opt: sh feeds the df-cap aggregate AND the semi-join probe
    # side, and the capped table feeds BOTH join sides — pin each once
    # (multi-consumer subtree policy) instead of re-running the shingle
    # window pipeline per consumer. Measured 2.69 → 2.09 s min-of-5.
    sh = shingle_rows(docs, 3, extra_cols=["split"]).localCheckpoint(
        eager=False
    )
    keep = (
        sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") <= _CONTAM_DF_CAP)
        .select("shingle")
    )
    capped = sh.join(keep, "shingle", "left_semi").localCheckpoint(eager=False)
    tr = capped.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    ev = capped.filter(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    return (
        tr.join(ev, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _CONTAM_MIN_SHARED)
        .orderBy(F.col("n_shared").desc(), "train_id", "eval_id")
    )


@register(
    "q_vocab_build",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counted AS (
  SELECT token, COUNT(*) AS n FROM tok
  GROUP BY token HAVING COUNT(*) >= 20
)
SELECT token, n,
  ROW_NUMBER() OVER (ORDER BY n DESC, token) AS token_id
FROM counted
""",
)
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction (tokenizer-training's first stage): corpus →
    token counts → min-count threshold → deterministic frequency-ordered
    ids. Ids come from the range-partitioned two-pass global rank
    (operators.rank_global) so the id assignment scales to web-corpus
    vocabularies — a naive global ROW_NUMBER puts every distinct token
    through one partition. Ordering (n DESC, token) is total, so ids are
    reproducible across engines and runs — the property that lets a
    re-run not silently re-map every token id."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )
    return with_global_ranks(
        counted,
        order_by=[(F.col("n"), False), (F.col("token"), True)],
        row_number_col="token_id",
    ).select("token", "n", "token_id")


# shared with q_hybrid_search_rrf (plans.vectors), which fuses this
# lexical ranking with the semantic one
BM25_ORACLE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok
  WHERE token IN ('data', 'model', 'learning')
  GROUP BY doc_id, token
),
dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dlen FROM documents
),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                 / COUNT(*) FROM documents) AS avg_dlen
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
),
scored AS (
  SELECT tf.doc_id,
    SUM(
      ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf * 2.2)
      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avg_dlen))
    ) AS score
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


@register("q_bm25_search", oracle=BM25_ORACLE_SQL)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75) for the query
    {data, model, learning}: tf per (doc, term) after a pushdown-able
    term filter, df + corpus stats as 1-row/tiny broadcast sides,
    scoring as pure expressions, top-k via TakeOrderedAndProject. At
    100 TB the only data-bearing shuffle is the (doc, term) tf count:
    the document length rides along that aggregation (projected next to
    the exploded tokens, picked with first()), so there is no separate
    full-corpus doc-length join — everything else joins against
    broadcast-sized aggregates. Scores rounded to 6 dp (ln + divisions
    drift in the last ulp across engines); ordering ties broken by
    doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    terms = ["data", "model", "learning"]
    tok = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("dlen"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).filter(F.col("token").isin(terms))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dlen").alias("dlen"),  # constant per doc_id
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(F.split(F.col("text"), " "))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_dlen"),
    )
    df_t = tf.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dlen") / F.col("avg_dlen"))
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * (F.col("tf") * 2.2) / denom).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@register(
    "q_vocab_apply",
    oracle="""
WITH counted AS (
  SELECT token, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token HAVING COUNT(*) >= 20
),
vocab AS (
  SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS token_id
  FROM counted
),
tok AS (
  SELECT doc_id, pos, string_split(text, ' ')[pos] AS token
  FROM documents, unnest(range(1, len(string_split(text, ' ')) + 1)) AS t(pos)
  WHERE doc_id < 500
)
SELECT tok.doc_id,
  -- space-joined string, not a list: the driver canonicalizer cannot
  -- lexsort list cells (pandas TypeError: unhashable type)
  array_to_string(list(COALESCE(vocab.token_id, 0) ORDER BY tok.pos), ' ')
    AS ids,
  COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN vocab.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unk
FROM tok LEFT JOIN vocab ON tok.token = vocab.token
GROUP BY tok.doc_id
ORDER BY tok.doc_id
""",
)
def q_vocab_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding — the tokenize step after q_vocab_build: each
    document becomes its ordered token-id sequence (unknown → 0), the
    input format sequence packing consumes. Join is (token ⋈ vocab):
    the vocab is broadcast-sized by construction (min-count threshold);
    position order is restored by sorting (pos, id) structs inside the
    row, so no ordering assumption rides on the shuffle."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )
    vocab = with_global_ranks(
        counted,
        order_by=[(F.col("n"), False), (F.col("token"), True)],
        row_number_col="token_id",
    ).select("token", "token_id")
    tok = (
        docs.filter(F.col("doc_id") < 500)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
    )
    enc = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.coalesce("token_id", F.lit(0)).alias("tid"),
                            )
                        )
                    ),
                    lambda s: s.getField("tid").cast("string"),
                ),
                " ",
            ).alias("ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0)).alias("n_unk"),
        )
    )
    return enc.orderBy("doc_id")


@register(
    "q_dedup_increment",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
),
sig0 AS (
  SELECT doc_id, {_MH_AGGS_DUCK} FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_BAND_KEYS_DUCK} FROM sig0
),
bands AS (
  {_BAND_UNION_DUCK}
),
corpus_bands AS (SELECT * FROM bands WHERE doc_id % 10 < 8),
new_bands AS (SELECT * FROM bands WHERE doc_id % 10 >= 8),
matched AS (
  SELECT n.doc_id, MIN(c.doc_id) AS matched_corpus_id
  FROM new_bands n
  LEFT JOIN corpus_bands c
    ON n.band = c.band AND n.band_key = c.band_key
  GROUP BY n.doc_id
)
SELECT d.doc_id,
       m.matched_corpus_id IS NOT NULL AS is_dup,
       m.matched_corpus_id
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 >= 8) d
LEFT JOIN matched m ON d.doc_id = m.doc_id
""",
)
def q_dedup_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-incremental near-dup (operators.dedup.minhash_dedup_increment):
    the 80% of documents with doc_id % 10 < 8 play the EXISTING corpus
    whose LSH band index is already persisted; the remaining 20% are the
    arriving increment, which is deduped by hashing ONLY its own
    documents and joining band keys against the index. The oracle
    replays the same signatures from scratch — proving the incremental
    path answers exactly what a full recompute would."""
    from flink_template_spark.operators.dedup import (
        minhash_band_index,
        minhash_dedup_increment,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    newbies = docs.filter(F.col("doc_id") % 10 >= 8)
    index = minhash_band_index(corpus)
    return minhash_dedup_increment(newbies, index)


@register(
    "q_source_overlap_matrix",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
tagged AS (
  SELECT DISTINCT s.shingle, d.source
  FROM sh s JOIN documents d ON s.doc_id = d.doc_id
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM tagged a JOIN tagged b ON a.shingle = b.shingle
  WHERE a.source < b.source
),
per_source AS (
  SELECT source, COUNT(*) AS n_distinct_shingles FROM tagged GROUP BY source
)
SELECT p.source_a, p.source_b,
  COUNT(*) AS n_shared_shingles,
  ROUND(CAST(COUNT(*) AS DOUBLE) / LEAST(sa.n_distinct_shingles,
        sb.n_distinct_shingles), 6) AS overlap_frac
FROM pairs p
JOIN per_source sa ON p.source_a = sa.source
JOIN per_source sb ON p.source_b = sb.source
GROUP BY p.source_a, p.source_b, sa.n_distinct_shingles,
         sb.n_distinct_shingles
ORDER BY p.source_a, p.source_b
""",
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix at the 3-gram shingle level: for
    every source pair, how many distinct shingles they share and the
    overlap as a fraction of the smaller side — the diagnostic that
    tells a curation run which ingestion feeds mirror each other (and
    should be deduplicated jointly, not independently). Shingle-level
    (not whole-text-hash) so near-dup mirrors count too — and so the
    oracle comparison is non-vacuous at every test scale (the testdata
    has zero cross-source byte-identical texts below sf0.1, but always
    shares shingles).

    Scale shape: documents reduce to DISTINCT (shingle, source) rows
    before any join; the pair join is shingle-keyed and the overlap
    aggregate is per source pair (a handful of rows); per-source totals
    broadcast."""
    from flink_template_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    tagged = (
        shingle_rows(docs, 3, extra_cols=["source"])
        .select("shingle", "source")
        .distinct()
    )
    a = tagged.select("shingle", F.col("source").alias("source_a"))
    b = tagged.select("shingle", F.col("source").alias("source_b"))
    pairs = a.join(b, "shingle").filter(F.col("source_a") < F.col("source_b"))
    per_source = tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct_shingles")
    )
    sa = per_source.select(
        F.col("source").alias("source_a"),
        F.col("n_distinct_shingles").alias("na"),
    )
    sb = per_source.select(
        F.col("source").alias("source_b"),
        F.col("n_distinct_shingles").alias("nb"),
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_shingles",
            F.round(
                F.col("n_shared_shingles").cast("double") / F.least("na", "nb"),
                6,
            ).alias("overlap_frac"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "q_dup_cluster_sizes",
    oracle=f"""{_COMPONENTS_CTE}
SELECT cluster_size,
  COUNT(*) AS n_clusters,
  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
  CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM sized
GROUP BY cluster_size
ORDER BY cluster_size
""",
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: how many clusters of each
    size, how many documents they hold, and how many a keep-one-per-
    cluster dedup would remove — the headline numbers a dedup run
    reports (singleton count = untouched corpus, the tail = mirror
    farms). Built on the same component fixpoint as
    q_near_dup_components (served from the memoized table); the
    histogram is an aggregate over the (already cluster-sized)
    component table."""
    comp = _near_dup_components_table(spark, sf_dir)
    # one row per component, cluster_size already attached by the
    # operator — no re-aggregation of the per-doc rows
    sized = comp.filter(F.col("is_keeper")).select("component", "cluster_size")
    return (
        sized.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


@register(
    "q_jaccard_prefix_pairs",
    oracle=f"""
WITH sh AS ({_duck_shingles(4)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT
  id_a, id_b, n_inter,
  ROUND(CAST(n_inter AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.id_a = sa.doc_id
JOIN sizes sb ON inter.id_b = sb.doc_id
WHERE n_inter * 20 >= 9 * (sa.n_sh + sb.n_sh - n_inter)
""",
)
def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 9/20 over 4-gram shingles via PPJoin prefix
    filtering (operators.dedup.jaccard_prefix_pairs) — the scalable
    exact dual of q_ngram_jaccard_pairs: candidates come only from the
    RAREST shingles of each document, so one hot boilerplate shingle
    can't quadratically explode a bucket. The oracle is the brute-force
    all-pairs join; the threshold filter is integer arithmetic on both
    sides, so the boundary is bit-exact with no epsilon."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_pairs(docs, t_num=9, t_den=20, n=4)


# full winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03): k-gram hashes,
# sliding window of WINNOW_W consecutive hashes, keep each window's
# minimum with the RIGHTMOST-position tie-break; guarantees any shared
# substring of >= WINNOW_W + WINNOW_K - 1 tokens yields a shared
# fingerprint. The (hash, rightmost-pos) selection is encoded in ONE
# bigint key = h * 2^31 + (2^31-1-pos): the window MIN is a single
# portable integer op in both engines, max key = (2^32-1)*2^31 + 2^31-1
# = 2^63-1 exactly (no bigint overflow even under ANSI mode), and the
# encoding is lossless for any document under 2^31 tokens — far beyond
# the longest real document, vs. the 2^20 (1M-token) cliff an earlier
# draft had.
WINNOW_K = 3
WINNOW_W = 4
_POS_ENC = 1 << 31


@register(
    "q_winnowing_fingerprints",
    oracle=f"""
WITH kg AS (
  SELECT doc_id, i - 1 AS pos,
         {md5int_duckdb("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(range(1, len(w) - {WINNOW_K - 2})) AS t(i)
),
keyed AS (
  SELECT doc_id, pos,
         h * {_POS_ENC} + ({_POS_ENC - 1} - pos) AS key,
         MIN(h * {_POS_ENC} + ({_POS_ENC - 1} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
         ) AS minkey,
         COUNT(*) OVER (PARTITION BY doc_id) AS m
  FROM kg
)
SELECT DISTINCT doc_id,
  CAST(minkey // {_POS_ENC} AS BIGINT) AS fp_hash,
  CAST({_POS_ENC - 1} - (minkey % {_POS_ENC}) AS BIGINT) AS fp_pos
FROM keyed
WHERE pos <= m - {WINNOW_W}
""",
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprint set per document: (fp_hash, fp_pos) of the
    rightmost-minimum k-gram hash in every window of WINNOW_W
    consecutive hashes, deduplicated (consecutive windows usually
    re-select the same minimum — that collapse is winnowing's density
    guarantee, ~2/(w+1) of positions). One doc-keyed window shuffle
    covers the k-gram build, the sliding min, and the dedup; at corpus
    scale fingerprints feed an equi-join index exactly like MinHash
    bands (a shared >= w+k-1-token passage ALWAYS shares a
    fingerprint — the exact-guarantee dual of MinHash's probabilistic
    one)."""
    from flink_template_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    kg = shingle_rows(docs, WINNOW_K, distinct=False, keep_pos=True).select(
        "doc_id", "pos", F.expr(md5int_spark("shingle")).alias("h")
    )
    wd = W.partitionBy("doc_id").orderBy("pos")
    key = F.col("h") * _POS_ENC + (F.lit(_POS_ENC - 1) - F.col("pos"))
    wk = wd.rowsBetween(0, WINNOW_W - 1)
    keyed = kg.select(
        "doc_id",
        "pos",
        F.min(key).over(wk).alias("minkey"),
        F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("m"),
    )
    return (
        keyed.filter(F.col("pos") <= F.col("m") - WINNOW_W)
        .select(
            "doc_id",
            F.expr(f"minkey DIV {_POS_ENC}").alias("fp_hash"),
            (F.lit(_POS_ENC - 1) - F.col("minkey") % _POS_ENC).alias(
                "fp_pos"
            ),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood (merge/purge) blocking — the skew-proof 5th family
# ---------------------------------------------------------------------------

_SNM_WINDOW = 4  # compare each row to its 3 sort-successors per pass


def _snm_oracle() -> str:
    branches = []
    for key in ("text", "rkey"):
        for k in range(1, _SNM_WINDOW):
            branches.append(
                f"    SELECT doc_id, lead(doc_id, {k}) OVER "
                f"(PARTITION BY lang ORDER BY {key}, doc_id) AS n FROM base"
            )
    union = "\n    UNION ALL\n".join(branches)
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, text, lang,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS rkey
  FROM documents
),
cand AS MATERIALIZED (
  SELECT DISTINCT LEAST(doc_id, n) AS id_a, GREATEST(doc_id, n) AS id_b
  FROM (
{union}
  ) WHERE n IS NOT NULL AND doc_id <> n
),
sh AS MATERIALIZED ({_duck_shingles(3)}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter,
  ROUND(CAST(n_inter AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.id_a = sa.doc_id
JOIN sizes sb ON inter.id_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
      >= 0.4999995
"""


@register("q_sorted_neighborhood_pairs", oracle=_snm_oracle())
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood near-dup pairs
    (operators.dedup.sorted_neighborhood_pairs): per-language sort by
    text order then reversed-word order, window-4 neighbor candidates,
    exact shingle-Jaccard verification at >= 0.5. The skew-proof
    blocking family: a fixed window-1 candidate budget per row per
    pass regardless of how hot any bucket is (where LSH/shingle
    buckets go quadratic). Precision 1 by construction; recall vs the
    brute-force join is pinned in tests/test_simhash_wide.py."""
    from flink_template_spark.operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs, window=_SNM_WINDOW, threshold=0.5
    )


def _leakage_split_oracle() -> str:
    # function-level import: plans.datapipe does not import text_dedup,
    # so pulling its split fragment here is cycle-free at decoration time
    from flink_template_spark.plans.datapipe import _split_sql

    return f"""{_COMPONENTS_CTE}
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT component) AS BIGINT) AS n_clusters,
  CAST(SUM(CASE WHEN naive <> split THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rescued
FROM (
  SELECT cc.node AS doc_id, cc.component,
    {_split_sql('component')} AS split,
    {_split_sql('node')} AS naive
  FROM cc
)
GROUP BY split
ORDER BY split
"""


@register("q_leakage_safe_split", oracle=_leakage_split_oracle())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split hash is keyed
    on the NEAR-DUP CLUSTER id (the component's canonical min doc_id),
    not the document id — so a whole cluster of near-duplicates lands
    in ONE split and can never straddle train/test (the contamination
    channel a per-doc hash split leaves open: doc A in train, its 0.9-
    Jaccard twin in test). Output per split: doc count, cluster count,
    and n_rescued — how many docs the naive per-doc split would have
    placed in a DIFFERENT split than their cluster (each one a leak
    this operator closed). Builds on the proven pieces: the components
    fixpoint (q_near_dup_components, served from the memoized
    components table — VERDICT r7 next #2: the 7.4 s wall was this
    recompute) and the portable hash split (q_train_test_split);
    singleton docs hash exactly as before (component == doc_id), so
    only genuine duplicate clusters move."""
    from flink_template_spark.plans.datapipe import split_of

    comp = _near_dup_components_table(spark, sf_dir).select(
        "doc_id", "component"
    )
    tagged = comp.select(
        "doc_id",
        "component",
        split_of("component").alias("split"),
        split_of("doc_id").alias("__naive"),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("component").cast("bigint").alias("n_clusters"),
            F.sum(
                (F.col("__naive") != F.col("split")).cast("int")
            )
            .cast("bigint")
            .alias("n_rescued"),
        )
        .orderBy("split")
    )




# C4-style corpus-level segment dedup: documents are segmented into
# consecutive SEG_W-word blocks (the "line" surrogate for this corpus's
# newline-free text); any block whose text occurs more than once in the
# WHOLE corpus keeps only its globally-first occurrence (min doc_id,
# then min position) and every other occurrence is dropped — the C4
# "deduplicate lines across the corpus" rule that strips boilerplate
# (nav bars, license footers) without dropping whole documents. The
# first-occurrence winner is a MIN over an encoded (doc_id, seg_idx)
# bigint — an aggregate with map-side partials, not a per-segment
# sorted window, so a boilerplate block shared by 10M docs costs one
# hot-key agg, never a quadratic bucket or a funnel sort.
SEG_W = 8
_SEG_ENC = 1 << 31  # key = doc_id * 2^31 + seg_idx (both < 2^31)


@register(
    "q_line_dedup_corpus",
    oracle=f"""
WITH segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(
           list_slice(w, {SEG_W} * i + 1, {SEG_W} * i + {SEG_W}), ' ') AS seg,
         doc_id * {_SEG_ENC} + i AS key
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(range(0, CAST(ceil(len(w) / {SEG_W}.0) AS INT))) AS t(i)
),
mins AS (
  SELECT seg, MIN(key) AS min_key, COUNT(*) AS n_occ
  FROM segs GROUP BY seg
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN s.key = m.min_key THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed,
       COALESCE(string_agg(CASE WHEN s.key = m.min_key THEN s.seg END,
                           ' ' ORDER BY s.seg_idx), '') AS kept_text
FROM segs s JOIN mins m ON s.seg = m.seg
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
)
def q_line_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-segment removal (the C4 line-dedup rule;
    see module comment above SEG_W): per document, how many SEG_W-word
    blocks it had, how many were removed as non-first duplicate
    occurrences, and the surviving text reassembled in order.

    Scale shape: one segment-keyed groupBy computes each distinct
    block's global first occurrence (MIN of the encoded
    doc_id*2^31+seg_idx key — commutative, map-side combinable) and
    occurrence count; one equi-join tags occurrences; one doc-keyed
    aggregate reassembles. At 100 TB the segment join key would be the
    block's hash rather than its text (identical plan shape); the
    reassembly's collect_list is per-document (document-sized, not
    corpus-sized) and sorts each doc's own blocks only.

    Key-encoding guard (ADVICE r6): key = doc_id*2^31 + seg_idx is
    order-preserving (so MIN = true first occurrence) only while
    0 <= doc_id < 2^31; a larger id would silently alias or overflow
    bigint and corrupt the keep set with no error. The key expression
    carries an ``assert_true`` on that bound — one codegen comparison
    per segment row, and the job FAILS LOUDLY on an out-of-range id
    instead of dropping the wrong occurrences (seg_idx < 2^31 is
    structural: it would need a single 2^31·SEG_W-token document)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    id_ok = (F.col("doc_id") >= 0) & (F.col("doc_id") < _SEG_ENC)
    checked_key = F.when(
        F.assert_true(
            id_ok, F.concat(F.lit("doc_id out of key range: "), "doc_id")
        ).isNull(),
        F.col("doc_id") * _SEG_ENC + F.col("seg_idx"),
    )
    segs = (
        docs.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.expr(f"CAST(ceil(size(w) / {SEG_W}.0) AS INT) - 1"),
                )
            ).alias("seg_idx"),
            F.col("w"),
        )
        .select(
            "doc_id",
            "seg_idx",
            F.array_join(
                F.slice("w", F.col("seg_idx") * SEG_W + 1, SEG_W), " "
            ).alias("seg"),
            checked_key.alias("key"),
        )
    )
    mins = segs.groupBy("seg").agg(
        F.min("key").alias("min_key"), F.count(F.lit(1)).alias("n_occ")
    )
    tagged = segs.join(mins, "seg").withColumn(
        "kept", F.col("key") == F.col("min_key")
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("kept"),
                                    F.struct("seg_idx", "seg"),
                                )
                            )
                        ),
                        lambda x: x["seg"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("kept_text"),
        )
        .select(
            "doc_id",
            F.col("n_segs").cast("bigint").alias("n_segs"),
            "n_removed",
            "kept_text",
        )
        .orderBy("doc_id")
    )


@register(
    "q_containment_pairs",
    oracle=f"""
WITH sh AS ({_duck_shingles(4)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter,
  ROUND(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6) AS containment
FROM inter
JOIN sizes sa ON inter.id_a = sa.doc_id
WHERE n_inter * 5 >= 4 * sa.n_sh
""",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered containment pairs C(a -> b) >= 4/5 over 4-gram shingles
    via one-sided prefix filtering
    (operators.dedup.containment_prefix_pairs) — finds documents
    mostly CONTAINED in another (excerpt spam, quoted-wrapper
    boilerplate) that Jaccard can't see when the container is much
    larger. The oracle is the brute-force ordered-pairs join; the
    threshold filter is integer arithmetic on both sides, so the
    boundary is bit-exact with no epsilon."""
    from flink_template_spark.operators.dedup import containment_prefix_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_prefix_pairs(docs, t_num=4, t_den=5, n=4)


def _split_leakage_oracle() -> str:
    from flink_template_spark.plans.datapipe import _split_sql

    return f"""
WITH kg AS (
  SELECT doc_id, i - 1 AS pos,
         {md5int_duckdb("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(range(1, len(w) - {WINNOW_K - 2})) AS t(i)
),
keyed AS (
  SELECT doc_id, pos,
         MIN(h * {_POS_ENC} + ({_POS_ENC - 1} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
         ) AS minkey,
         COUNT(*) OVER (PARTITION BY doc_id) AS m
  FROM kg
),
fps AS (
  SELECT DISTINCT doc_id, CAST(minkey // {_POS_ENC} AS BIGINT) AS h,
         {_split_sql("doc_id")} AS split
  FROM keyed WHERE pos <= m - {WINNOW_W}
),
sp AS (SELECT DISTINCT split, h FROM fps),
shared AS (
  SELECT a.split AS s1, b.split AS s2, COUNT(*) AS n_shared_fps
  FROM sp a JOIN sp b ON a.h = b.h AND a.split <> b.split
  GROUP BY 1, 2
),
contaminated AS (
  SELECT f.split AS s1, o.split AS s2,
         COUNT(DISTINCT f.doc_id) AS n_docs_contaminated
  FROM fps f JOIN sp o ON f.h = o.h AND f.split <> o.split
  GROUP BY 1, 2
)
SELECT c.s1 AS split_docs, c.s2 AS split_other,
       CAST(s.n_shared_fps AS BIGINT) AS n_shared_fps,
       CAST(c.n_docs_contaminated AS BIGINT) AS n_docs_contaminated
FROM contaminated c
JOIN shared s ON s.s1 = c.s1 AND s.s2 = c.s2
ORDER BY 1, 2
"""


@register("q_split_fingerprint_leakage", oracle=_split_leakage_oracle())
def q_split_fingerprint_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit of the naive id-hash train/val/test split:
    for every directed split pair, how many winnowed fingerprints
    (q_winnowing_fingerprints' exact shared-passage guarantee) occur on
    BOTH sides, and how many documents on the first side carry at least
    one of them — the eval-leakage number that motivates the
    cluster-keyed split (q_leakage_safe_split). Run against any split
    before training: nonzero n_docs_contaminated on a (test, train) row
    means eval passages literally occur in the training corpus.

    Scale shape: fingerprinting is the one doc-keyed window pass;
    all audit joins are on fingerprint hash against per-split DISTINCT
    hash sets (<= |splits| rows per hash), so a boilerplate passage
    shared by millions of docs multiplies the probe by at most the
    split count — never quadratic in its popularity."""
    from flink_template_spark.operators.dedup import shingle_rows
    from flink_template_spark.plans.datapipe import split_of

    docs = load_table(spark, sf_dir, "documents")
    kg = shingle_rows(docs, WINNOW_K, distinct=False, keep_pos=True).select(
        "doc_id", "pos", F.expr(md5int_spark("shingle")).alias("h")
    )
    wd = W.partitionBy("doc_id").orderBy("pos")
    key = F.col("h") * _POS_ENC + (F.lit(_POS_ENC - 1) - F.col("pos"))
    keyed = kg.select(
        "doc_id",
        "pos",
        F.min(key).over(wd.rowsBetween(0, WINNOW_W - 1)).alias("minkey"),
        F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("m"),
    )
    # fps feeds the shared-hash audit (via sp) AND the contaminated-doc
    # count; the lazy checkpoint pins the fingerprint table so the
    # k-gram window pass runs once (shared-subtree discipline) — fps is
    # fingerprint-sized (~2/(w+1) of token positions), not corpus-sized
    fps = (
        keyed.filter(F.col("pos") <= F.col("m") - WINNOW_W)
        .select(
            "doc_id",
            F.expr(f"minkey DIV {_POS_ENC}").alias("h"),
            split_of("doc_id").alias("split"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sp = fps.select("split", "h").distinct().localCheckpoint(eager=False)
    sa = sp.select(F.col("split").alias("s1"), "h")
    sb = sp.select(F.col("split").alias("s2"), "h")
    shared = (
        sa.join(sb, "h")
        .filter(F.col("s1") != F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
    contaminated = (
        fps.join(sb, "h")
        .filter(F.col("split") != F.col("s2"))
        .groupBy(F.col("split").alias("s1"), "s2")
        .agg(F.count_distinct("doc_id").alias("n_docs_contaminated"))
    )
    return (
        contaminated.join(shared, ["s1", "s2"])
        .select(
            F.col("s1").alias("split_docs"),
            F.col("s2").alias("split_other"),
            F.col("n_shared_fps").cast("bigint").alias("n_shared_fps"),
            F.col("n_docs_contaminated")
            .cast("bigint")
            .alias("n_docs_contaminated"),
        )
        .orderBy("split_docs", "split_other")
    )


_PHRASES = ["table table", "fast key scan", "slow table", "the row a"]
_PHRASE_TOP = 5

# Build-once positional posting index for phrase search (VERDICT r6
# what's-wrong #2: the previous plan re-planned the posexplode subtree
# once per word per phrase — 2L full corpus scans × P phrases). The
# memo persists the index once per (session, sf_dir, query-vocabulary),
# exactly the `_TRADE_EDGES_MEMO` pattern (plans/graph.py): at 100 TB
# this is the token-bucketed inverted index a retrieval pipeline
# materializes once and every phrase query probes. The persisted
# relation is restricted to the query vocabulary (a literal IN filter
# pushed into the explode's consumer), so its size is
# O(df(query tokens)), not corpus-sized.
_POSTING_MEMO = SessionLRUMemo(
    "phrase_postings", max_entries=4, entry_df=lambda e: e[0]
)


def _phrase_posting_index(
    spark: SparkSession, sf_dir: str, vocab: tuple[str, ...]
) -> tuple[DataFrame, dict[str, int]]:
    """(posting, df_counts): the persisted vocabulary-restricted
    positional posting table and the per-token posting counts (a
    bounded |vocab|-row collect, the control-plane statistic that
    orders each phrase's join chain rarest-token-first)."""

    def _build() -> tuple[DataFrame, dict[str, int]]:
        docs = load_table(spark, sf_dir, "documents")
        posting = (
            docs.select(
                "doc_id",
                F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
            )
            .filter(F.col("token").isin(list(vocab)))
            .persist()
        )
        counts = {
            r["token"]: r["n"]
            for r in posting.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # materializes the persist; ≤ |vocab| rows
        }
        for t in vocab:
            counts.setdefault(t, 0)
        return posting, counts

    key = (spark.sparkContext.applicationId, sf_dir, vocab)
    return _POSTING_MEMO.get_or_build(key, _build)


def _phrase_oracle() -> str:
    blocks = []
    for phrase in _PHRASES:
        words = phrase.split(" ")
        joins = "\n    ".join(
            f"JOIN posting t{i} ON t{i}.doc_id = t0.doc_id "
            f"AND t{i}.pos = t0.pos + {i} AND t{i}.token = '{w}'"
            for i, w in enumerate(words)
            if i > 0
        )
        blocks.append(f"""
  SELECT '{phrase}' AS phrase, t0.doc_id,
         COUNT(*) AS n_matches, MIN(t0.pos) AS first_pos
  FROM posting t0
    {joins}
  WHERE t0.token = '{words[0]}'
  GROUP BY t0.doc_id
""")
    union = "  UNION ALL\n".join(blocks)
    return f"""
WITH posting AS MATERIALIZED (
  SELECT doc_id, i - 1 AS pos, w[i] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(range(1, len(w) + 1)) AS t(i)
),
matches AS (
{union}
),
ranked AS (
  SELECT phrase, doc_id, n_matches, first_pos,
    ROW_NUMBER() OVER (PARTITION BY phrase
                       ORDER BY n_matches DESC, doc_id) AS rk
  FROM matches
)
SELECT phrase, doc_id,
  CAST(n_matches AS BIGINT) AS n_matches,
  CAST(first_pos AS BIGINT) AS first_pos
FROM ranked WHERE rk <= {_PHRASE_TOP}
ORDER BY phrase, doc_id
"""


@register("q_phrase_search", oracle=_phrase_oracle())
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index: for each
    query phrase, the top-{_PHRASE_TOP} documents by occurrence count
    (doc_id tiebreak) with the first match position — the
    positional-retrieval primitive BM25's bag-of-words scoring cannot
    express (quoted queries, template detection, citation finding).

    Plan shape (reworked per VERDICT r6 what's-wrong #2): the
    vocabulary-restricted positional posting index is MATERIALIZED ONCE
    per (session, sf_dir, vocab) via ``_POSTING_MEMO`` — every token
    filter below is an InMemoryTableScan bucket probe, never a corpus
    re-scan (plan-pinned by
    ``test_phrase_search_single_posting_build``). Each phrase is then a
    chain of L-1 self-equi-joins on (doc_id, phrase_start), ordered
    RAREST-TOKEN-FIRST from the index's per-token posting counts (a
    bounded |vocab|-row control-plane lookup), so candidates shrink at
    the first join regardless of word order in the phrase; the top-k
    rides WindowGroupLimit (rank pushdown), never a global sort.
    Join-order invariance: all links are inner equi-joins on the same
    derived key p0 = pos - offset (the phrase start), so reordering
    cannot change the match set, the count, or min(p0). All-integer
    arithmetic."""
    vocab = tuple(sorted({w for p in _PHRASES for w in p.split(" ")}))
    posting, df_counts = _phrase_posting_index(spark, sf_dir, vocab)
    matches = None
    for phrase in _PHRASES:
        words = phrase.split(" ")
        # df-ascending with the in-phrase offset as tiebreak (determinism)
        order = sorted(range(len(words)), key=lambda i: (df_counts[words[i]], i))
        first = order[0]
        cur = posting.filter(F.col("token") == words[first]).select(
            "doc_id", (F.col("pos") - first).alias("p0")
        )
        for i in order[1:]:
            nxt = posting.filter(F.col("token") == words[i]).select(
                "doc_id", (F.col("pos") - i).alias("p0")
            )
            cur = cur.join(nxt, ["doc_id", "p0"])
        m = cur.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("p0").alias("first_pos"),
        ).select(F.lit(phrase).alias("phrase"), "doc_id", "n_matches", "first_pos")
        matches = m if matches is None else matches.unionByName(m)
    wp = W.partitionBy("phrase").orderBy(F.desc("n_matches"), "doc_id")
    return (
        matches.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _PHRASE_TOP)
        .select(
            "phrase",
            "doc_id",
            F.col("n_matches").cast("bigint").alias("n_matches"),
            F.col("first_pos").cast("bigint").alias("first_pos"),
        )
        .orderBy("phrase", "doc_id")
    )


# --- Content-defined chunking (CDC) dedup ---------------------------------
#
# The storage-level dedup primitive (LBFS/Venti lineage, the algorithm
# under every dedup filesystem and chunked blob store): chunk
# boundaries are declared where a rolling hash of the last _CDC_W
# tokens hits 0 mod _CDC_D, so boundaries are CONTENT-ANCHORED — an
# insertion near the top of a document shifts byte offsets but the
# downstream chunk boundaries re-synchronize, and every unshifted
# chunk still dedups (fixed-size blocks lose all alignment after one
# insertion; that resilience is CDC's whole reason to exist).
#
# Portable arithmetic: token hash = md5int32, window hash =
# (Σ th_{i-j}·B^j) mod P over the last _CDC_W positions with
# P = 2^31-1 and B^j reduced mod P (every product < 2^62, every sum
# < 2^33 — no bigint overflow in either engine).
_CDC_W = 4  # rolling window (tokens)
_CDC_D = 8  # boundary divisor -> expected chunk length ~ _CDC_D tokens
_CDC_B = 1000003
_CDC_P = MERSENNE_P
_CDC_BPOW = [pow(_CDC_B, j, _CDC_P) for j in range(_CDC_W)]  # B^0..B^3 mod P


def _cdc_whash_sql(th_terms: list[str]) -> str:
    """Dialect-neutral window hash: ``th_terms[j]`` is the SQL for the
    token hash j positions back (j=0 is the current token)."""
    parts = [
        f"((({t}) % {_CDC_P}) * {_CDC_BPOW[j]}) % {_CDC_P}"
        for j, t in enumerate(th_terms)
    ]
    return f"({' + '.join(parts)}) % {_CDC_P}"


def _cdc_oracle() -> str:
    th = md5int_duckdb("w[i]")
    whash = _cdc_whash_sql(
        ["th"] + [f"lag(th, {j}) OVER win" for j in range(1, _CDC_W)]
    )
    chash = md5int_duckdb("ctext", bits=60)
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, source, i - 1 AS pos, w[i] AS token, {th} AS th
  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       unnest(range(1, len(w) + 1)) AS t(i)
),
hashed AS (
  SELECT doc_id, source, pos, token,
    CASE WHEN pos >= {_CDC_W - 1} THEN {whash} END AS whash
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
flagged AS (
  SELECT doc_id, source, pos, token,
    COALESCE(SUM(CASE WHEN whash % {_CDC_D} = 0 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS chunk_idx
  FROM hashed
),
chunks AS MATERIALIZED (
  SELECT doc_id, source, chunk_idx,
    string_agg(token, ' ' ORDER BY pos) AS ctext
  FROM flagged GROUP BY doc_id, source, chunk_idx
),
keyed AS (
  SELECT source, len(ctext) AS clen, {chash} AS chash,
    doc_id * {1 << 31} + chunk_idx AS key
  FROM chunks
),
firsts AS (
  SELECT chash, MIN(key) AS min_key FROM keyed GROUP BY chash
)
SELECT k.source,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(CASE WHEN k.key = f.min_key THEN 1 ELSE 0 END) AS BIGINT)
    AS n_first,
  CAST(SUM(k.clen) AS BIGINT) AS chars_total,
  CAST(SUM(CASE WHEN k.key = f.min_key THEN k.clen ELSE 0 END) AS BIGINT)
    AS chars_first,
  ROUND(CAST(SUM(CASE WHEN k.key = f.min_key THEN k.clen ELSE 0 END) AS DOUBLE)
        / CAST(SUM(k.clen) AS DOUBLE), 6) AS store_ratio
FROM keyed k JOIN firsts f ON k.chash = f.chash
GROUP BY k.source
ORDER BY k.source
"""


def cdc_chunk_table(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """The reusable CDC chunking pass: (doc_id, *extra_cols, chunk_idx,
    ctext) — rolling-hash anchored chunks per document (module comment
    above _CDC_W). Shared by the batch dedup audit below and the
    streaming chunk-store ingest (streaming.cdc_ingest), so both tiers
    chunk BIT-IDENTICALLY — a chunk stored by the stream is the chunk
    the batch audit accounts for."""
    carry = list(extra_cols)
    tok = docs.select(
        "doc_id",
        *carry,
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    ).withColumn("th", F.expr(md5int_spark("token")))
    win = W.partitionBy("doc_id").orderBy("pos")
    whash = F.expr(
        _cdc_whash_sql(["th"] + [f"__th{j}" for j in range(1, _CDC_W)])
    )
    hashed = tok.select(
        "doc_id",
        *carry,
        "pos",
        "token",
        "th",
        *[F.lag("th", j).over(win).alias(f"__th{j}") for j in range(1, _CDC_W)],
    ).select(
        "doc_id",
        *carry,
        "pos",
        "token",
        F.when(F.col("pos") >= _CDC_W - 1, whash).alias("whash"),
    )
    w_prev = win.rowsBetween(W.unboundedPreceding, -1)
    flagged = hashed.select(
        "doc_id",
        *carry,
        "pos",
        "token",
        F.coalesce(
            F.sum(
                F.when(F.col("whash") % _CDC_D == 0, 1).otherwise(0)
            ).over(w_prev),
            F.lit(0),
        ).alias("chunk_idx"),
    )
    return flagged.groupBy("doc_id", *carry, "chunk_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda x: x["token"],
            ),
            " ",
        ).alias("ctext")
    )


def cdc_checked_key() -> "F.Column":
    """The guarded doc_id·2^31+chunk_idx first-occurrence key (same
    encoding + assert_true range guard as q_line_dedup_corpus)."""
    id_ok = (F.col("doc_id") >= 0) & (F.col("doc_id") < (1 << 31))
    return F.when(
        F.assert_true(
            id_ok, F.concat(F.lit("doc_id out of key range: "), "doc_id")
        ).isNull(),
        F.col("doc_id") * (1 << 31) + F.col("chunk_idx"),
    )


@register("q_cdc_chunk_dedup", oracle=_cdc_oracle())
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup audit per source: chunk every
    document at rolling-hash anchors (see the module comment above
    _CDC_W), identify each chunk's global first occurrence, and report
    what fraction of each source's characters a chunk store would
    actually persist (store_ratio = chars_first / chars_total) — the
    storage-dedup complement of q_line_dedup_corpus's fixed-stride
    segments: CDC boundaries survive insertions, so shifted copies of
    shared passages still dedup. The streaming chunk-store ingest
    (streaming.cdc_ingest) maintains the same store incrementally.

    Scale shape: per-doc lag windows (doc-partitioned, never global);
    the chunk table shuffles 60-bit chunk HASHES (never chunk text)
    into one hash-agg for first-occurrence MIN (map-side combinable)
    plus one equi-join back; per-source stats are a partial-agg
    rollup. First-occurrence key packing reuses the guarded
    doc_id·2^31+idx encoding (assert_true on the doc_id range, as in
    q_line_dedup_corpus; chunk_idx < 2^31 is structural — a chunk
    index that large needs a single multi-billion-token document)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = cdc_chunk_table(docs, extra_cols=("source",))
    keyed = chunks.select(
        "source",
        F.length("ctext").alias("clen"),
        F.expr(md5int_spark("ctext", bits=60)).alias("chash"),
        cdc_checked_key().alias("key"),
    )
    firsts = keyed.groupBy("chash").agg(F.min("key").alias("min_key"))
    kept = F.col("key") == F.col("min_key")
    return (
        keyed.join(firsts, "chash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_first"),
            F.sum("clen").cast("bigint").alias("chars_total"),
            F.sum(F.when(kept, F.col("clen")).otherwise(0))
            .cast("bigint")
            .alias("chars_first"),
        )
        .select(
            "source",
            "n_chunks",
            "n_first",
            "chars_total",
            "chars_first",
            F.round(
                F.col("chars_first").cast("double")
                / F.col("chars_total").cast("double"),
                6,
            ).alias("store_ratio"),
        )
        .orderBy("source")
    )


@register(
    "q_lsh_recall_audit",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b,
    ROUND(CAST(n_inter AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
        >= 0.4999995
),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
),
sig0 AS (
  SELECT doc_id, {_MH_AGGS_DUCK} FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_BAND_KEYS_DUCK} FROM sig0
),
bands AS (
  {_BAND_UNION_DUCK}
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
SELECT LEAST(CAST(floor(t.jaccard * 10) AS BIGINT), 9) AS j_decile,
  CAST(COUNT(*) AS BIGINT) AS n_true,
  CAST(SUM(CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_caught,
  ROUND(CAST(SUM(CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS recall
FROM truth t
LEFT JOIN cands c ON t.id_a = c.id_a AND t.id_b = c.id_b
GROUP BY 1
ORDER BY 1
""",
)
def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical LSH S-curve: recall of the banded MinHash candidate
    generator (q_minhash_lsh_pairs' exact configuration —
    {NUM_HASHES} hashes, {LSH_BANDS} bands) against exact n-gram
    Jaccard ground truth (q_ngram_jaccard_pairs' exact threshold
    semantics), bucketed by Jaccard decile. This is the audit that
    decides the dedup stack's band/row configuration: theory says
    P(candidate) = 1-(1-s^r)^b, and this measures it on THIS corpus —
    a recall dip in the 0.5-0.6 decile means near-dups at the
    threshold boundary are being silently missed.

    Scale shape: the GROUND-TRUTH side is the quadratic cost, paid by
    an eval run, not the pipeline (the recall_eval posture); the
    candidate side is the production banded bucket join. The decile
    rollup joins pair-keyed aggregates. Each side tokenizes its own
    shingle relation — the repo's documented recompute-per-consumer
    policy for corpus×token intermediates (SCALE.md): materializing
    the shingle table to share it is the worse trade at 100 TB."""
    from flink_template_spark.operators.dedup import (
        minhash_lsh_pairs as _lsh,
        ngram_jaccard_pairs as _truth,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = _truth(docs, threshold=0.5).select("id_a", "id_b", "jaccard")
    cands = (
        _lsh(docs)
        .select("id_a", "id_b")
        .withColumn("caught", F.lit(1))
    )
    bucket = F.least(F.floor(F.col("jaccard") * 10).cast("bigint"), F.lit(9))
    return (
        truth.join(cands, ["id_a", "id_b"], "left")
        .select(bucket.alias("j_decile"), F.coalesce("caught", F.lit(0)).alias("caught"))
        .groupBy("j_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            F.sum("caught").cast("bigint").alias("n_caught"),
            F.round(
                F.sum("caught").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("recall"),
        )
        .orderBy("j_decile")
    )


@register(
    "q_dedup_rate_by_source",
    oracle=f"""{_COMPONENTS_CTE}
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN cc.node = cc.component THEN 1 ELSE 0 END) AS BIGINT)
    AS n_keepers,
  CAST(COUNT(*) - SUM(CASE WHEN cc.node = cc.component THEN 1 ELSE 0 END)
       AS BIGINT) AS n_removed,
  ROUND(CAST(COUNT(*)
             - SUM(CASE WHEN cc.node = cc.component THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
FROM cc JOIN documents d ON cc.node = d.doc_id
GROUP BY d.source
ORDER BY d.source
""",
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate rate under keep-min-id near-dup dedup: for
    each corpus source, how many documents a cluster-keeper policy
    would drop — the per-provider quality number a curation team reads
    before renegotiating a data source (a 30%-duplicate crawl slice and
    a 2%-duplicate curated slice should not be weighted alike).

    Serves clusters from the memoized components table (one fixpoint
    per session+sf, VERDICT r7 next #2 pattern) joined to documents on
    doc_id — a key-partitioned equi-join plus one hash aggregate to
    |sources| rows. Integer counts; one exact division, 6-dp."""
    docs = load_table(spark, sf_dir, "documents")
    comp = _near_dup_components_table(spark, sf_dir).select("doc_id", "is_keeper")
    keeper = F.col("is_keeper").cast("int")
    return (
        comp.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(keeper).cast("bigint").alias("n_keepers"),
            (F.count(F.lit(1)) - F.sum(keeper)).cast("bigint").alias("n_removed"),
            F.round(
                (F.count(F.lit(1)) - F.sum(keeper)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


_EDIT_PREFIX = 40  # verify on a fixed-length prefix: bounds the DP cost
_EDIT_MAXD = 25  # near-dup acceptance threshold
_EDIT_BLOCK = 20  # length-bucket width for the SNM blocking


@register(
    "q_edit_distance_pairs",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, n_chars // {_EDIT_BLOCK} AS lb,
         substr(text, 1, {_EDIT_PREFIX}) AS t40, text
  FROM documents
),
s AS (
  SELECT doc_id, t40,
    LEAD(doc_id) OVER w AS nid, LEAD(t40) OVER w AS nt40
  FROM b WINDOW w AS (PARTITION BY lang, lb ORDER BY text, doc_id)
)
SELECT LEAST(doc_id, nid) AS id_a, GREATEST(doc_id, nid) AS id_b,
  CAST(levenshtein(t40, nt40) AS BIGINT) AS dist
FROM s
WHERE nid IS NOT NULL AND levenshtein(t40, nt40) <= {_EDIT_MAXD}
ORDER BY id_a, id_b
""",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verification over sorted-neighborhood
    candidates: within (lang, length-bucket) blocks sorted by text,
    each document is compared to its immediate neighbor by Levenshtein
    distance on a fixed {_EDIT_PREFIX}-char prefix, keeping pairs at
    distance <= {_EDIT_MAXD}. The character-level complement to the
    token-level Jaccard family (typo-level mutations move every
    shingle but cost 1 edit each) — and the same candidate discipline:
    a window-1 neighbor budget per row, NEVER all pairs.

    Scale shape: blocking + LEAD run in per-(lang, bucket) partitioned
    windows (the SNM pattern, skew-bounded by construction); the
    Levenshtein DP is map-side codegen (both engines' built-in), cost
    capped at {_EDIT_PREFIX}² per candidate by the prefix truncation.
    Distances are exact integers — no float discipline needed."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / _EDIT_BLOCK).cast("bigint").alias("lb"),
        F.substring(F.col("text"), 1, _EDIT_PREFIX).alias("t40"),
        "text",
    )
    w = W.partitionBy("lang", "lb").orderBy("text", "doc_id")
    s = b.select(
        "doc_id",
        "t40",
        F.lead("doc_id").over(w).alias("nid"),
        F.lead("t40").over(w).alias("nt40"),
    )
    dist = F.levenshtein(F.col("t40"), F.col("nt40"))
    return (
        s.filter(F.col("nid").isNotNull() & (dist <= _EDIT_MAXD))
        .select(
            F.least("doc_id", "nid").alias("id_a"),
            F.greatest("doc_id", "nid").alias("id_b"),
            dist.cast("bigint").alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )


# round 9: analytic S-curve calibration for the LSH band configuration.
# The multiplication chain for P(candidate) = 1-(1-s^r)^b is written
# explicitly (squarings, r = 4 rows/band, b = 4 bands) so BOTH engines
# evaluate the identical IEEE expression tree — pow() implementations
# are not guaranteed to agree across engines, repeated multiplication is.
_SCURVE_PRED_SQL = """
  SELECT id_a, id_b, jaccard,
         1.0 - (q2 * q2) AS p_pred
  FROM (
    SELECT id_a, id_b, jaccard, q1 * q1 AS q2
    FROM (
      SELECT id_a, id_b, jaccard, 1.0 - (s2 * s2) AS q1
      FROM (
        SELECT id_a, id_b, jaccard, jaccard * jaccard AS s2
        FROM truth
      )
    )
  )
"""


@register(
    "q_lsh_curve_calibration",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b,
    ROUND(CAST(n_inter AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
        >= 0.4999995
),
pred AS ({_SCURVE_PRED_SQL}),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
),
sig0 AS (
  SELECT doc_id, {_MH_AGGS_DUCK} FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_BAND_KEYS_DUCK} FROM sig0
),
bands AS (
  {_BAND_UNION_DUCK}
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
SELECT LEAST(CAST(floor(t.jaccard * 10) AS BIGINT), 9) AS j_decile,
  CAST(COUNT(*) AS BIGINT) AS n_true,
  ROUND(CAST(SUM(CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS recall,
  ROUND(CAST(SUM(CAST(ROUND(t.p_pred, 8) AS DECIMAL(12,8))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS predicted,
  ROUND(
    CAST(SUM(CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE)
    - CAST(SUM(CAST(ROUND(t.p_pred, 8) AS DECIMAL(12,8))) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE),
    6) AS calibration_gap
FROM pred t
LEFT JOIN cands c ON t.id_a = c.id_a AND t.id_b = c.id_b
GROUP BY 1
ORDER BY 1
""",
)
def q_lsh_curve_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-vs-measured LSH S-curve calibration: for each Jaccard
    decile of the ground-truth near-dup pairs, compare the MEASURED
    banded-MinHash candidate recall (q_lsh_recall_audit's empirical
    number) against the THEORY prediction mean(1-(1-s^r)^b) evaluated
    at each pair's exact similarity — the calibration_gap column is
    the number a band-tuning decision reads (a large negative gap at
    the threshold decile says: add bands or shorten them).

    Float discipline: the prediction is a fixed squaring chain
    (s²→s⁴, (1-s⁴)²→(1-s⁴)⁴) — identical IEEE tree in both engines,
    no pow(); per-pair predictions are rounded to 8 dp and summed as
    DECIMAL so the group mean is order-independent.

    Scale shape: identical to q_lsh_recall_audit (truth side is the
    eval-run quadratic, candidates are the production bucket join);
    the prediction adds four map-side multiplications per pair."""
    from flink_template_spark.functions.hashing import LSH_BANDS, NUM_HASHES
    from flink_template_spark.operators.dedup import (
        minhash_lsh_pairs as _lsh,
        ngram_jaccard_pairs as _truth,
    )

    # the explicit squaring chains below encode r = 4, b = 4; a config
    # change must break HERE, not silently drift from the prediction
    assert NUM_HASHES // LSH_BANDS == 4 and LSH_BANDS == 4

    docs = load_table(spark, sf_dir, "documents")
    truth = _truth(docs, threshold=0.5).select("id_a", "id_b", "jaccard")
    s = F.col("jaccard")
    pred = (
        truth.withColumn("s2", s * s)
        .withColumn("q1", F.lit(1.0) - (F.col("s2") * F.col("s2")))
        .withColumn("q2", F.col("q1") * F.col("q1"))
        .withColumn("p_pred", F.lit(1.0) - (F.col("q2") * F.col("q2")))
    )
    cands = _lsh(docs).select("id_a", "id_b").withColumn("caught", F.lit(1))
    bucket = F.least(F.floor(s * 10).cast("bigint"), F.lit(9))
    caught = F.coalesce("caught", F.lit(0))
    joined = pred.join(cands, ["id_a", "id_b"], "left").select(
        bucket.alias("j_decile"),
        caught.alias("caught"),
        F.round("p_pred", 8).cast("decimal(12,8)").alias("p_dec"),
    )
    n = F.count(F.lit(1)).cast("double")
    recall = F.sum("caught").cast("double") / n
    predicted = F.sum("p_dec").cast("double") / n
    return (
        joined.groupBy("j_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            F.round(recall, 6).alias("recall"),
            F.round(predicted, 6).alias("predicted"),
            F.round(recall - predicted, 6).alias("calibration_gap"),
        )
        .orderBy("j_decile")
    )


@register(
    "q_golden_record_merge",
    oracle=f"""{_COMPONENTS_CTE}
SELECT
  cc.component,
  FIRST(d.doc_id ORDER BY d.n_chars DESC, d.doc_id) AS golden_doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM cc
JOIN documents d ON cc.node = d.doc_id
GROUP BY cc.component
HAVING COUNT(*) > 1
ORDER BY cc.component
""",
)
def q_golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record merge — entity resolution's second
    half: within each near-dup cluster (the memoized connected
    components), elect the canonical record by rule (longest text,
    doc_id tiebreak) and merge provenance (distinct sources, total
    chars). Clusters of one are pass-through and excluded.

    Scale shape: serves from the per-session components memo (zero
    extra fixpoint cost — the 100 TB artifact-layout posture shared
    with q_leakage_safe_split); one broadcast-free hash agg keyed by
    component with min_by inside the aggregate — no window pass."""
    comps = _near_dup_components_table(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        comps.select("doc_id", "component")
        .join(docs, "doc_id")
        .groupBy("component")
        .agg(
            F.min_by(
                "doc_id",
                F.struct(
                    (-F.col("n_chars")).alias("neg_chars"),
                    F.col("doc_id").alias("id"),
                ),
            ).alias("golden_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("component")
    )


# round 9: MinHash estimator-quality audit — per-position agreement sum
# generated from the same NUM_HASHES constant on both sides.
_MH_AGREE_DUCK = " + ".join(
    f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END"
    for i in range(NUM_HASHES)
)


@register(
    "q_minhash_estimate_error",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
),
sig0 AS (
  SELECT doc_id, {_MH_AGGS_DUCK} FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_BAND_KEYS_DUCK} FROM sig0
),
bands AS (
  {_BAND_UNION_DUCK}
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(sb.shingle) AS n_inter
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT
    c.id_a, c.id_b,
    ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
          / CAST(za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0) AS DOUBLE), 6)
      AS exact_j,
    CAST({_MH_AGREE_DUCK} AS DOUBLE) / {NUM_HASHES}.0 AS est_j
  FROM cands c
  LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes za ON c.id_a = za.doc_id
  JOIN sizes zb ON c.id_b = zb.doc_id
  JOIN sig0 a ON c.id_a = a.doc_id
  JOIN sig0 b ON c.id_b = b.doc_id
)
SELECT
  LEAST(CAST(floor(exact_j * 10) AS BIGINT), 9) AS j_decile,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND(CAST(SUM(CAST(ROUND(exact_j, 8) AS DECIMAL(12,8))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_exact,
  ROUND(CAST(SUM(CAST(ROUND(est_j, 8) AS DECIMAL(12,8))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_est,
  ROUND(CAST(SUM(CAST(ROUND(ABS(est_j - exact_j), 8) AS DECIMAL(12,8)))
             AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_abs_err
FROM scored
GROUP BY 1 ORDER BY 1
""",
)
def q_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit: over the production LSH
    candidate pairs, the signature-agreement Jaccard estimate
    (matching positions / {NUM_HASHES}) against exact shingle Jaccard,
    per exact-similarity decile — mean_abs_err is the estimator's
    measured resolution (theory: sd ≈ sqrt(s(1-s)/{NUM_HASHES})), the
    number that justifies (or indicts) a 16-hash signature budget.
    Complements q_lsh_recall_audit (did we FIND the pair) with DID WE
    SCORE IT RIGHT.

    Scale shape: candidates from the banded bucket join (never
    all-pairs); agreement is {NUM_HASHES} map-side comparisons on the
    two joined signature rows; exact Jaccard joins the shingle-bucket
    intersection counts (LEFT: a hash-collision candidate with zero
    overlap scores exact 0). Per-pair terms round to 8 dp and sum as
    DECIMAL — order-independent group means."""
    from flink_template_spark.operators.dedup import (
        minhash_signatures as _sigs,
        shingle_rows as _shingles,
    )
    from flink_template_spark.functions.hashing import (
        LSH_BANDS as _B,
        NUM_HASHES as _NH,
        ROWS_PER_BAND as _R,
    )

    # r12 opt: the original body called minhash_lsh_pairs,
    # ngram_jaccard_pairs and minhash_signatures×2 as black boxes —
    # FOUR independent shingle→md5→16-min signature pipelines in one
    # plan (Spark's exchange reuse cannot stitch them back together
    # across differing downstream projections). This is the same
    # pinned-subtree shape q_minhash_jaccard_err already uses: ONE
    # signature pipeline (band keys + both estimate sides), ONE
    # shingle table (sizes + both exact-join sides). Every output
    # expression below is the original tree on the same operands —
    # candidates are the identical banded bucket pair set, exact_j is
    # the identical round-6 Jaccard with the identical LEFT-join
    # zero-overlap coalesce. Measured 4.12 → 3.29 s min-of-5 at sf0.1
    # (−20%; exchange reuse had already stitched part of the
    # duplication back together — the pins buy the rest plus ~60
    # fewer plan nodes).
    docs = load_table(spark, sf_dir, "documents")
    sigs = _sigs(docs).localCheckpoint(eager=False)
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh_{b * _R + r}").cast("string")
                    for r in range(_R)
                ],
            )
            for b in range(_B)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )
    buckets = bands.groupBy("band", "band_key").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids")
    )
    lhs = buckets.filter(F.size("ids") > 1).select(
        F.posexplode("ids").alias("i", "id_a"), "ids"
    )
    cands = (
        lhs.select(
            "id_a",
            F.explode(
                F.slice("ids", F.col("i") + F.lit(2), F.size("ids"))
            ).alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: inter join + scored
    )
    sh = _shingles(docs, 3).localCheckpoint(
        eager=False
    )  # consumers: sizes + both exact-join sides
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cands.join(sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(_NH)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(_NH)],
    )
    agree = sum(
        (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int") for i in range(_NH)
    )
    ni = F.coalesce(F.col("n_inter"), F.lit(0))
    exact_jac = F.round(
        ni.cast("double")
        / (F.col("n_a") + F.col("n_b") - ni).cast("double"),
        6,
    )
    scored = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b")),
            "id_b",
        )
        .withColumn("exact_j", exact_jac)
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_j", agree.cast("double") / F.lit(float(_NH)))
    )
    dec = lambda c: F.round(c, 8).cast("decimal(12,8)")  # noqa: E731
    n = F.count(F.lit(1))
    return (
        scored.groupBy(
            F.least(
                F.floor(F.col("exact_j") * 10).cast("bigint"), F.lit(9)
            ).alias("j_decile")
        )
        .agg(
            n.cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(dec(F.col("exact_j"))).cast("double") / n.cast("double"),
                6,
            ).alias("mean_exact"),
            F.round(
                F.sum(dec(F.col("est_j"))).cast("double") / n.cast("double"),
                6,
            ).alias("mean_est"),
            F.round(
                F.sum(dec(F.abs(F.col("est_j") - F.col("exact_j"))))
                .cast("double")
                / n.cast("double"),
                6,
            ).alias("mean_abs_err"),
        )
        .orderBy("j_decile")
    )


_MH_EST_TERMS = " + ".join(
    f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)"
    for i in range(NUM_HASHES)
)


@register(
    "q_minhash_jaccard_err",
    oracle=f"""
WITH sh AS ({_duck_shingles(3)}),
hashed AS (
  SELECT doc_id, {md5int_duckdb('shingle')} AS h FROM sh
),
sig0 AS (
  SELECT doc_id, {_MH_AGGS_DUCK} FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {_BAND_KEYS_DUCK} FROM sig0
),
bands AS (
  {_BAND_UNION_DUCK}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
  ROUND(({_MH_EST_TERMS}) / {NUM_HASHES}.0, 6) AS est_jaccard,
  ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
        / (sa.ns + sb.ns - COALESCE(i.ni, 0)), 6) AS exact_jaccard,
  ROUND(ABS(({_MH_EST_TERMS}) / {NUM_HASHES}.0
            - CAST(COALESCE(i.ni, 0) AS DOUBLE)
              / (sa.ns + sb.ns - COALESCE(i.ni, 0))), 6) AS abs_err
FROM cand c
JOIN sig0 a ON a.doc_id = c.id_a
JOIN sig0 b ON b.doc_id = c.id_b
LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
ORDER BY c.id_a, c.id_b
""",
)
def q_minhash_jaccard_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-error audit for the MinHash near-dup tier, PAIR GRAIN:
    for every LSH candidate pair, the 16-component MinHash Jaccard
    ESTIMATE (matching components / 16) against the EXACT 3-shingle
    Jaccard, with the absolute error — the drill-down under
    q_minhash_estimate_error's per-decile rollup (same candidates,
    same estimator, same exact reference; a consistency test recounts
    that rollup from THESE rows, so the two independently-implemented
    audits police each other), and the companion to q_lsh_recall_audit
    (which pairs the bands surface vs how well the sketch scores
    them). The σ ≈ √(J(1−J)/16) envelope is pinned in tests.

    Exactness: the estimate is an integer match count divided by 16
    (identical doubles); exact Jaccard is |∩|/(|A|+|B|−|∩|) on exact
    integer shingle counts; a band-collision candidate with ZERO
    shared shingles keeps an exact 0 via the LEFT join + coalesce.

    Scale shape: ONE signature pipeline (pinned — serves band keys AND
    both estimate sides); candidates come from the banded buckets
    (never all pairs); the exact-verify join touches only candidate
    ids' shingle rows (pairs ⋈ shingles is candidate-bounded)."""
    from flink_template_spark.functions.hashing import (
        LSH_BANDS as _B,
        NUM_HASHES as _H,
        ROWS_PER_BAND as _R,
    )
    from flink_template_spark.operators.dedup import (
        minhash_signatures,
        shingle_rows,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs).localCheckpoint(eager=False)
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh_{b * _R + r}").cast("string")
                    for r in range(_R)
                ],
            )
            for b in range(_B)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )
    buckets = bands.groupBy("band", "band_key").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids")
    )
    lhs = buckets.filter(F.size("ids") > 1).select(
        F.posexplode("ids").alias("i", "id_a"), "ids"
    )
    cand = (
        lhs.select(
            "id_a",
            F.explode(
                F.slice("ids", F.col("i") + F.lit(2), F.size("ids"))
            ).alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: est join + exact join
    )
    sh = shingle_rows(docs, 3).localCheckpoint(
        eager=False
    )  # consumers: sizes + both exact-join sides
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"a_mh_{i}") for i in range(_H)],
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"b_mh_{i}") for i in range(_H)],
    )
    match_terms = None
    for i in range(_H):
        t = F.when(F.col(f"a_mh_{i}") == F.col(f"b_mh_{i}"), 1).otherwise(0)
        match_terms = t if match_terms is None else match_terms + t
    est = match_terms / float(_H)
    ni = F.coalesce(F.col("ni"), F.lit(0))
    exact = ni.cast("double") / (F.col("a_ns") + F.col("b_ns") - ni)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("ns").alias("a_ns")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("ns").alias("b_ns")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
        .orderBy("id_a", "id_b")
    )
