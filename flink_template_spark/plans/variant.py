"""Schema-on-read dynamic JSON via Spark 4's VARIANT type.

The reference's parser first reads every record as *untyped* JSON — Gson
into ``Map<String, Any?>`` (JSONUtil.kt:129-131) — and only then
dispatches on discriminator fields. VARIANT is the Spark-native form of
that pattern: ``parse_json`` keeps the document in a binary,
shredding-friendly encoding, ``variant_get`` extracts typed paths
lazily, and unknown/missing paths yield NULL instead of throwing
(mirroring the reference's drop-don't-fail posture, JSONUtil.kt:164-167).

At 100 TB this is the right layout for semi-structured columns: one
VARIANT column instead of exploding every possible key into its own
sparse column; extraction happens JVM-side after pruning, and engines
can shred hot paths into columnar storage without a schema migration.

Oracles: DuckDB has no VARIANT, so each query's oracle goes through its
JSON functions (events.props) or through the lossless relational dual
(synthesized JSON round-trips back to the source columns) — equal
results prove the VARIANT path is exact, not approximately parsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table


@register(
    "q_variant_props_stats",
    oracle="""
SELECT
  event_type,
  COUNT(*) AS n_events,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  -- CAST: DuckDB SUM(int) -> HUGEINT -> float64; Spark emits int64
  CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""",
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props JSON → VARIANT once, then typed path extraction.

    ``try_parse_json`` (malformed → NULL, never an error) + two
    ``variant_get`` paths, one present (``$.k``) and one absent
    (``$.missing`` — NULL per variant semantics, counted to pin the
    drop-don't-fail behavior)."""
    events = load_table(spark, sf_dir, "events")
    v = events.withColumn("v", F.try_parse_json("props"))
    return (
        v.select(
            "event_type",
            F.try_variant_get("v", "$.k", "bigint").alias("k"),
            F.try_variant_get("v", "$.missing", "string").alias("miss"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("miss").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
    )


@register(
    "q_variant_roundtrip",
    oracle="""
SELECT
  o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM orders
GROUP BY o_orderpriority
""",
)
def q_variant_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational rows → nested JSON document → VARIANT → typed nested
    paths (``$.meta.ids[1]``-style) → aggregate. The oracle is the plain
    relational query on the source columns: equality proves the
    serialize→parse→extract chain is lossless for ints and strings,
    including array indexing and a two-level struct path."""
    orders = load_table(spark, sf_dir, "orders")
    doc = orders.select(
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("o_orderpriority").alias("pri"),
                    F.struct(
                        F.array("o_orderkey", "o_custkey").alias("ids"),
                    ).alias("meta"),
                )
            )
        ).alias("v")
    )
    return (
        doc.select(
            F.variant_get("v", "$.pri", "string").alias("priority"),
            F.variant_get("v", "$.meta.ids[0]", "bigint").alias("k"),
            F.variant_get("v", "$.meta.ids[1]", "bigint").alias("c"),
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("k").alias("sum_key"),
            F.sum("c").alias("sum_cust"),
        )
    )
