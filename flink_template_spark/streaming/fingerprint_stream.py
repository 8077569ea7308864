"""Continuously maintained content fingerprints (streaming integrity).

The streaming dual of plans.functions_ext.q_content_fingerprint: as
documents flow in, each micro-batch appends its per-source
(n_rows, xor_fp, sum_fp) rows to a changelog; readers fold them to the
fingerprint of EVERYTHING ingested so far. All three aggregates merge
(XOR and SUM are associative/commutative, counts add), so the
maintained fingerprint is bit-identical to the batch fingerprint over
the full history — the property that lets a replication target verify
itself against the source continuously instead of with a full rescan.

XOR/SUM state is ADDITIVE (not idempotent), so this module rides the
counter-safe changelog contract in streaming.changelog — one base +
folded-epochs sidecar, every compaction crash point replays to the
exact fingerprints (the machinery's crash windows are pinned by the
CMS tests; the stream==batch equality here is pinned by
tests/test_fingerprint_stream.py).

Scale shape: per epoch the writer ships |sources-in-batch| rows; the
reader folds (epochs × sources) rows until compaction returns it to
|sources|. The fingerprint math itself is the map-side hash + combine
shape of the batch query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.streaming.changelog import (
    compact_state,
    read_state,
)

_COLS = ["source", "n_rows", "xor_fp", "sum_fp"]


def _batch_fingerprints(batch_df: DataFrame) -> DataFrame:
    """Per-source fingerprint rows of ONE batch — same serialization
    and hash-prefix scheme as the batch q_content_fingerprint."""
    from flink_template_spark.plans.functions_ext import _fp_serial

    hexed = batch_df.select(
        "source", F.md5(F.expr(_fp_serial("STRING"))).alias("hx")
    )
    return hexed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("BIT_XOR(CAST(conv(substr(hx, 1, 15), 16, 10) AS BIGINT))")
        .cast("bigint")
        .alias("xor_fp"),
        F.sum(F.expr("CAST(conv(substr(hx, 1, 8), 16, 10) AS BIGINT)"))
        .cast("bigint")
        .alias("sum_fp"),
    )


def _merge(union: DataFrame) -> DataFrame:
    return union.groupBy("source").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.expr("BIT_XOR(xor_fp)").cast("bigint").alias("xor_fp"),
        F.sum("sum_fp").cast("bigint").alias("sum_fp"),
    )


def write_fingerprint_stream(
    docs: DataFrame,
    state_dir: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Start the fingerprint changelog writer (append mode; one
    overwrite-by-epoch directory per micro-batch — retry-idempotent)."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            _batch_fingerprints(batch_df)
            .repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(state_dir, "changelog", f"epoch={epoch_id}"))
        )

    writer = (
        docs.writeStream.outputMode("append")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_fingerprints(spark: SparkSession, state_dir: str) -> DataFrame:
    """(source, n_rows, xor_fp, sum_fp) over everything ingested —
    bit-identical to the batch fingerprint of the same rows."""
    try:
        return read_state(spark, state_dir, _COLS, _merge)
    except FileNotFoundError:
        raise FileNotFoundError(f"no fingerprint state under {state_dir}")


def compact_fingerprints(spark: SparkSession, state_dir: str) -> None:
    """Fold the changelog into a |sources|-row base snapshot under the
    counter-safe sidecar contract."""
    compact_state(spark, state_dir, _COLS, _merge)
