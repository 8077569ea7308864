"""Multimodal asset model: media as opaque ``binary`` payloads + typed
metadata (SURVEY.md §2.7 north-star / BASELINE.json multimodal columns).

Design for 100 TB:
- payloads are opaque bytes in a ``binary`` column — never decoded in
  the relational layer; filters/joins run on the typed ``meta`` struct
  so partition pruning and pushdown work on metadata alone;
- decode / feature-extraction crosses into Python ONCE, Arrow-batched,
  via ``mapInPandas`` (see multimodal.features) — batch shape is
  (asset_id, payload) in, fixed-width feature rows out;
- frame sampling is pure Column algebra (no Python): every k-th
  fixed-size slice via hex substring, so Catalyst keeps it in codegen.

The container has no image/audio codecs, so the testdata assets are
synthesized deterministically from ``documents`` (payload = UTF-8 bytes
of the text, metadata derived from doc_id) — both engines can derive
the identical bytes, which makes the binary plumbing oracle-checkable.
Real decoders plug in at exactly one seam: ``features.decode_stub``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.tables import load_table

MEDIA_TYPES = ["image", "audio", "video"]


def load_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal asset table.

    Columns: asset_id, media_type, payload binary,
    meta struct<width int, height int, sample_rate int, n_frames int>.
    Metadata fields are media-type-dependent (NULL where inapplicable),
    mirroring how real ingest carries per-modality EXIF/codec info.
    """
    docs = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(mt != "audio", (F.col("doc_id") % 192 + 64).cast("int")).alias(
                "width"
            ),
            F.when(mt != "audio", (F.col("doc_id") % 128 + 64).cast("int")).alias(
                "height"
            ),
            F.when(mt == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(mt == "video", (F.col("doc_id") % 240 + 24).cast("int")).alias(
                "n_frames"
            ),
        ).alias("meta"),
    )


# DuckDB oracle fragment producing the identical asset table from the
# pre-registered ``documents`` view (hex() because DuckDB cannot
# substring blobs; Spark compares on hex too).
ASSETS_ORACLE_CTE = """
assets AS (
  SELECT
    doc_id AS asset_id,
    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
    encode(text) AS payload,
    CAST(doc_id % 192 + 64 AS INT) AS width,
    CAST(doc_id % 128 + 64 AS INT) AS height
  FROM documents
)
"""
