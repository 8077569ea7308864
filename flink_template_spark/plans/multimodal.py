"""Multimodal-column queries: binary payload stats, metadata filtering,
frame sampling, and the mapInPandas feature-extraction pass.

Payload stats and frame sampling are oracle-checked bit-for-bit (the
asset table derives deterministically from ``documents`` in both
engines; frames compare as hex because DuckDB cannot slice blobs).
Feature extraction is golden-tested in tests/test_multimodal.py AND
value-checked against SQL: q_multimodal_byte_histogram recomputes the
numpy decoder's histogram from hex pairs in DuckDB, so the Arrow
mapInPandas path is oracle-verified end-to-end (q_multimodal_features
stays rows-only for the full 16-bin vector).

Scale notes: stats and frames are pure codegen expressions over the
binary column (no Python); the metadata filter prunes on the typed
``meta`` struct before any payload is touched — at 100 TB with
parquet column statistics that skips whole row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.multimodal.assets import ASSETS_ORACLE_CTE, load_assets
from flink_template_spark.multimodal.features import extract_features
from flink_template_spark.plans.registry import register

FRAME_BYTES = 32  # bytes per frame slice
FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "q_multimodal_payload_stats",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE}
SELECT
  media_type,
  COUNT(*) AS n_assets,
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT (float64 in pandas); keep int64.
  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
  MIN(octet_length(payload)) AS min_bytes,
  MAX(octet_length(payload)) AS max_bytes,
  -- hash the HEX of the blob on both engines so the comparison is
  -- byte-based and cannot diverge on non-UTF-8 payloads
  MIN(sha256(hex(payload))) AS min_sha
FROM assets
GROUP BY media_type
ORDER BY media_type
""",
)
def q_multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality byte accounting + content hash (ingest audit shape)."""
    assets = load_assets(spark, sf_dir)
    return (
        assets.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.min(F.octet_length("payload")).alias("min_bytes"),
            F.max(F.octet_length("payload")).alias("max_bytes"),
            F.min(F.sha2(F.hex("payload"), 256)).alias("min_sha"),
        )
        .orderBy("media_type")
    )


@register(
    "q_multimodal_meta_filter",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE}
SELECT asset_id, media_type, width, height,
  octet_length(payload) AS n_bytes
FROM assets
WHERE media_type IN ('image', 'video') AND width >= 200 AND height < 128
ORDER BY asset_id
""",
)
def q_multimodal_meta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only predicate — payload untouched (pruning path)."""
    assets = load_assets(spark, sf_dir)
    return (
        assets.filter(
            F.col("media_type").isin("image", "video")
            & (F.col("meta.width") >= 200)
            & (F.col("meta.height") < 128)
        )
        .select(
            "asset_id",
            "media_type",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.octet_length("payload").alias("n_bytes"),
        )
        .orderBy("asset_id")
    )


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE},
hexed AS (
  SELECT asset_id, hex(payload) AS h,
    octet_length(payload) // {FRAME_BYTES} AS n_frames
  FROM assets WHERE media_type = 'video'
)
SELECT asset_id, CAST(t.frame AS BIGINT) AS frame_idx,
  substr(h, CAST(t.frame AS BIGINT) * {2 * FRAME_BYTES} + 1,
         {2 * FRAME_BYTES}) AS frame_hex
FROM hexed, unnest(range(0, n_frames)) AS t(frame)
WHERE t.frame % {FRAME_STRIDE} = 0
ORDER BY asset_id, frame_idx
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every {stride}-th fixed-size frame of each video payload — pure
    Column algebra (sequence → transform → explode), no Python."""
    assets = load_assets(spark, sf_dir).filter(F.col("media_type") == "video")
    hexed = assets.select(
        "asset_id",
        F.hex(F.col("payload")).alias("h"),
        (F.octet_length("payload") / FRAME_BYTES).cast("long").alias("n_frames"),
    )
    frames = hexed.select(
        "asset_id",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % FRAME_STRIDE == 0,
            )
        ).alias("frame_idx"),
        "h",
    ).filter(F.col("n_frames") > 0)
    return frames.select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.substring(
            F.col("h"), (F.col("frame_idx") * (2 * FRAME_BYTES) + 1).cast("int"),
            2 * FRAME_BYTES,
        ).alias("frame_hex"),
    ).orderBy("asset_id", "frame_idx")


@register(
    "q_multimodal_features",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE},
hexed AS (
  SELECT asset_id, media_type, hex(payload) AS hx,
    octet_length(payload) AS n
  FROM assets
),
bytes AS (
  SELECT asset_id,
    CAST('0x' || substr(hx, CAST(i * 2 + 1 AS BIGINT), 2) AS BIGINT) // 16
      AS bin
  FROM hexed, unnest(range(0, n)) AS u(i)
),
f0s AS (
  SELECT asset_id,
    ROUND(COUNT(*) FILTER (bin = 0) / CAST(COUNT(*) AS DOUBLE), 6) AS f0
  FROM bytes GROUP BY asset_id
)
SELECT h.asset_id, h.media_type, CAST(h.n AS BIGINT) AS n_bytes,
  COALESCE(f.f0, 0.0) AS f0, 16 AS n_features
FROM hexed h LEFT JOIN f0s f USING (asset_id)
ORDER BY h.asset_id
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction. The oracle recomputes bin-0
    density + byte count from hex pairs in SQL (same technique the
    byte-histogram query pins), so the Arrow decode path is now
    hash-verified rather than rows-only; the full 16-bin vector is
    value-pinned in tests/test_multimodal.py."""
    assets = load_assets(spark, sf_dir)
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.size("features").alias("n_features"),
    ).orderBy("asset_id")


@register(
    "q_multimodal_byte_histogram",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE},
hexed AS (
  -- octet_length > 0: an empty payload would divide by zero here while
  -- Spark's fake_decode returns zeros; filter identically on both sides
  SELECT asset_id, hex(payload) AS hx, octet_length(payload) AS n
  FROM assets WHERE asset_id < 50 AND octet_length(payload) > 0
),
bytes AS (
  SELECT asset_id, n,
    CAST('0x' || substr(hx, CAST(i * 2 + 1 AS BIGINT), 2) AS BIGINT) // 16
      AS bin
  FROM hexed, unnest(range(0, n)) AS u(i)
)
SELECT
  asset_id,
  ANY_VALUE(n) AS n_bytes,
  ROUND(COUNT(*) FILTER (bin = 2) / CAST(ANY_VALUE(n) AS DOUBLE), 6) AS f2,
  ROUND(COUNT(*) FILTER (bin = 6) / CAST(ANY_VALUE(n) AS DOUBLE), 6) AS f6,
  ROUND(COUNT(*) FILTER (bin = 7) / CAST(ANY_VALUE(n) AS DOUBLE), 6) AS f7
FROM bytes
GROUP BY asset_id
ORDER BY asset_id
""",
)
def q_multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas decoder's output, ORACLE-CHECKED: DuckDB recomputes the
    byte histogram from hex pairs in SQL; Spark runs the real
    mapInPandas/numpy path (multimodal.features.fake_decode). Exact
    match proves the Arrow plumbing preserves values end-to-end, not
    just row counts."""
    assets = load_assets(spark, sf_dir).filter(
        (F.col("asset_id") < 50) & (F.octet_length("payload") > 0)
    )
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "n_bytes",
        F.round(F.element_at("features", 3), 6).alias("f2"),
        F.round(F.element_at("features", 7), 6).alias("f6"),
        F.round(F.element_at("features", 8), 6).alias("f7"),
    ).orderBy("asset_id")


@register(
    "q_multimodal_resize",
    oracle="""
SELECT
  doc_id AS asset_id,
  CASE ((doc_id % 3) + 1) WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END
    AS media_type,
  CASE WHEN ((doc_id % 3) + 1) = 1
       THEN 512
       ELSE octet_length(encode(text)) END AS n_bytes,
  CASE WHEN ((doc_id % 3) + 1) = 1 THEN 32 ELSE NULL END AS width,
  CASE WHEN ((doc_id % 3) + 1) = 1 THEN 16 ELSE NULL END AS height
FROM documents
WHERE doc_id < 200
ORDER BY asset_id
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass through mapInPandas (multimodal.features.resize_assets):
    images come back as 32×16 rasters with rewritten meta, other
    modalities pass through. The oracle re-derives the observable
    contract (payload size and meta rewrite per modality) in SQL; the
    pixel-level kernel itself is value-pinned in tests/test_multimodal.py.

    Note width/height are NULL for non-image rows here because video
    meta passes through — the projection nulls them to keep the oracle
    about the RESIZE contract, not the ingest fake."""
    from flink_template_spark.multimodal.features import resize_assets

    assets = load_assets(spark, sf_dir).filter(F.col("asset_id") < 200)
    out = resize_assets(assets, 32, 16)
    is_img = F.col("media_type") == "image"
    return out.select(
        "asset_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.when(is_img, F.col("meta.width")).alias("width"),
        F.when(is_img, F.col("meta.height")).alias("height"),
    ).orderBy("asset_id")


@register(
    "q_phash_dup_groups",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE},
hexed AS (
  -- octet_length > 0: empty payloads emit no byte rows here but DO get
  -- an all-zero signature from Spark's fake_decode; filter both sides
  SELECT asset_id, hex(payload) AS hx, octet_length(payload) AS n
  FROM assets WHERE octet_length(payload) > 0
),
bytes AS (
  SELECT asset_id, n,
    CAST('0x' || substr(hx, CAST(i * 2 + 1 AS BIGINT), 2) AS BIGINT) // 16
      AS bin
  FROM hexed, unnest(range(0, n)) AS u(i)
),
sigs AS (
  SELECT asset_id,
    {" + ".join(
        f"CASE WHEN COUNT(*) FILTER (bin = {b}) / CAST(ANY_VALUE(n) AS DOUBLE)"
        f" > 0.0625 THEN {1 << b} ELSE 0 END"
        for b in range(16)
    )} AS phash
  FROM bytes GROUP BY asset_id
)
SELECT CAST(phash AS BIGINT) AS phash, COUNT(*) AS n_assets,
       string_agg(CAST(asset_id AS VARCHAR), ' ' ORDER BY asset_id)
         AS asset_ids
FROM sigs
GROUP BY phash
HAVING COUNT(*) >= 2
""",
)
def q_phash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash duplicate grouping for media assets — the
    multimodal member of the dedup family: a 16-bit aHash-style
    signature (bit b set when byte-bin b's density exceeds the uniform
    1/16) computed from the SAME Arrow decode path the histogram query
    value-pins, then exact-signature grouping (one shuffle on the
    16-bit key, no pair explosion at any scale). The oracle rebuilds
    signatures from hex pairs in SQL, so the mapInPandas decode +
    expression bit-packing is hash-verified end-to-end. With a real
    codec at the decode_stub seam this becomes a standard image aHash.

    Output ``asset_ids`` is a space-joined string (not an array): the
    driver's pandas canonicalizer cannot lexsort list cells."""
    assets = load_assets(spark, sf_dir).filter(F.octet_length("payload") > 0)
    feats = extract_features(assets)
    bit = None
    for b in range(16):
        term = F.when(
            F.element_at("features", b + 1) > 0.0625, F.lit(1 << b)
        ).otherwise(0)
        bit = term if bit is None else bit + term
    sigs = feats.select("asset_id", bit.cast("bigint").alias("phash"))
    return (
        sigs.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("asset_id")),
                    lambda x: x.cast("string"),
                ),
                " ",
            ).alias("asset_ids"),
        )
        .filter(F.col("n_assets") >= 2)
    )


@register("q_multimodal_real_decode")  # rows-only: no SQL engine decodes WAV/PPM
def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode end-to-end: synthesize genuine RIFF-PCM WAV clips
    and binary P6 images deterministically from doc_id (inside the
    Arrow batch — tone frequency and gradient phase are functions of
    the id), then run the real-codec extraction
    (multimodal.features.extract_media_stats / multimodal.codecs).
    Rows-only by necessity — no SQL engine parses WAV headers — but
    the codecs themselves are closed-form pinned in
    tests/test_codecs.py (sine RMS = A/√2, ZCR = 2f, exact area-mean
    resize), which is stronger than a replayed oracle for numeric
    kernels.

    Scale shape: synthesis and decode share one mapInPandas crossing
    each, per-partition parallel; the returned stats are asset-row
    sized."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from flink_template_spark.multimodal.codecs import encode_ppm, encode_wav
    from flink_template_spark.multimodal.features import extract_media_stats
    from flink_template_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 64
    )

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:  # a 0.125 s tone at 200+did Hz
                    rate = 8000
                    t = np.arange(rate // 8) / rate
                    s = np.round(
                        0.4 * 32767 * np.sin(2 * np.pi * (200 + did) * t)
                    ).astype(np.int16)
                    out.append((did, "audio", encode_wav(s, rate)))
                else:  # an 8x8 deterministic gradient image
                    g = (
                        (np.indices((8, 8)).sum(axis=0) * (did % 29 + 1)) % 256
                    ).astype(np.uint8)
                    out.append((did, "image", encode_ppm(np.stack([g, g, g], -1))))
            yield pd.DataFrame(out, columns=["asset_id", "media_type", "payload"])

    assets = docs.mapInPandas(synth, schema)
    stats = extract_media_stats(assets)
    return stats.select(
        "asset_id",
        "kind",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("zcr_per_s", 6).alias("zcr_per_s"),
        "height",
        "width",
        F.round("luma_mean", 6).alias("luma_mean"),
    ).orderBy("asset_id")


@register(
    "q_audio_pcm_features",
    oracle=f"""
WITH {ASSETS_ORACLE_CTE},
hexed AS (
  SELECT asset_id, hex(payload) AS hx, octet_length(payload) // 2 AS ns
  FROM assets WHERE asset_id < 50 AND octet_length(payload) >= 2
),
samples AS (
  -- s16le: byte 2i is LOW, byte 2i+1 HIGH; hex chars for byte k are
  -- [2k+1, 2k+2] (1-based) -> sample i = '0x' || hi_pair || lo_pair
  SELECT asset_id, ns, i,
    CAST('0x' || substr(hx, CAST(i * 4 + 3 AS BIGINT), 2)
              || substr(hx, CAST(i * 4 + 1 AS BIGINT), 2) AS BIGINT) AS v
  FROM hexed, unnest(range(0, ns)) AS u(i)
),
signed AS (
  SELECT asset_id, ns, i,
    v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END AS s
  FROM samples
),
flips AS (
  SELECT asset_id, ns, s,
    CASE WHEN LAG(s) OVER (PARTITION BY asset_id ORDER BY i) IS NOT NULL
          AND ((s < 0) <> (LAG(s) OVER (PARTITION BY asset_id ORDER BY i) < 0))
         THEN 1 ELSE 0 END AS zf
  FROM signed
)
SELECT asset_id,
  CAST(ANY_VALUE(ns) AS BIGINT) AS n_samples,
  ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / ANY_VALUE(ns)), 6) AS rms,
  CAST(SUM(zf) AS BIGINT) AS n_zero_cross,
  CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
FROM flips
GROUP BY asset_id
ORDER BY asset_id
""",
)
def q_audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-PCM (s16le) audio triage features, ORACLE-CHECKED end-to-end:
    Spark runs the REAL Arrow-batched mapInPandas numpy path
    (multimodal.features.pcm16_features — the exact shape a production
    audio-curation pass uses on decoded PCM), while DuckDB recomputes
    the identical statistics from hex pairs in pure SQL. A hash match
    proves the Python boundary preserves every sample value — the
    q_multimodal_byte_histogram discipline extended from bytes to
    signed fixed-width samples. This closes the audio gap the rows-only
    WAV decode left: container parsing stays in codecs.decode_wav
    (closed-form pinned), but the sample MATH is now cross-engine
    verified. RMS is one sqrt of exact-integer sufficient statistics,
    rounded 6 dp; n_samples / zero-crossings / peak are exact ints.

    Scale shape: one Arrow-batched pass over the bounded demo subset
    (asset_id < 50, the byte-histogram convention — the per-sample SQL
    explode is oracle-side only; the Spark path is one mapInPandas with
    no shuffle before the final presentation sort)."""
    from flink_template_spark.multimodal.features import pcm16_features

    assets = load_assets(spark, sf_dir).filter(
        (F.col("asset_id") < 50) & (F.octet_length("payload") >= 2)
    )
    stats = pcm16_features(assets)
    return stats.select(
        "asset_id",
        "n_samples",
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples")), 6
        ).alias("rms"),
        "n_zero_cross",
        "peak_abs",
    ).orderBy("asset_id")
