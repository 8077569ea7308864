"""Streaming corpus ingest with near-dup rejection against a growing
LSH index — the 100 TB ingestion-dedup pattern.

New documents arrive as a stream; the corpus keeps a persisted MinHash
LSH band index (operators.dedup.minhash_band_index). Each micro-batch:

1. computes band keys for the incoming docs (batch semantics inside
   ``foreachBatch`` — the signature pipeline stays the codegen'd
   explode+partial-agg formulation, no stateful streaming agg needed);
2. drops docs whose any band collides with the index (near-dup against
   the existing corpus — LSH's no-false-negative-above-threshold side);
3. dedups *within* the batch the same way (first-id-wins among
   colliding docs) so two near-identical docs arriving together don't
   both pass;
4. appends survivors to the accepted-docs directory and their bands to
   the index — the index grows with the corpus, so later arrivals
   dedup against everything accepted so far.

Epoch-stamped output directories make retries idempotent (an epoch
re-run overwrites its own directories), mirroring streaming.rollup.

Scale: the per-batch work is bands(batch) ⋈ index on (band, band_key) —
a shuffle join keyed on the bucket, sub-quadratic exactly like batch
LSH; the index is O(corpus × LSH_BANDS) small rows, range-partitionable
and prunable. Nothing is ever collected to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.operators.dedup import minhash_band_index


from flink_template_spark.streaming.io_util import read_optional as _read_optional


def accepted_docs(spark: SparkSession, root: str) -> DataFrame:
    df = _read_optional(spark, os.path.join(root, "accepted"))
    if df is None:
        raise FileNotFoundError(f"no accepted docs under {root}")
    return df.drop("epoch")


def dedup_batch_against_index(
    spark: SparkSession, batch: DataFrame, index: DataFrame | None,
    id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Pure batch core (unit-testable without a stream): returns
    (novel_docs, novel_bands) given the incoming docs and the current
    index (None = empty corpus)."""
    batch = batch.cache()
    bands = minhash_band_index(batch, id_col, text_col).cache()

    # (2) reject docs colliding with the existing corpus
    if index is not None:
        hit_ids = (
            bands.join(index, ["band", "band_key"], "left_semi")
            .select(id_col)
            .distinct()
        )
        survivors = batch.join(hit_ids, id_col, "left_anti")
    else:
        survivors = batch

    # (3) within-batch dedup: among docs sharing a bucket, lowest id wins.
    # A doc survives unless some bucket-mate has a smaller id (min over
    # its buckets' minima), evaluated only over surviving docs' bands.
    surv_bands = bands.join(survivors.select(id_col), id_col, "left_semi")
    bucket_min = surv_bands.groupBy("band", "band_key").agg(
        F.min(id_col).alias("bucket_min")
    )
    keep_ids = (
        surv_bands.join(bucket_min, ["band", "band_key"])
        .groupBy(id_col)
        .agg(F.min("bucket_min").alias("all_min"))
        .filter(F.col("all_min") == F.col(id_col))
        .select(id_col)
    )
    # docs with no shingles (too short for MinHash) have no bands at all:
    # they can't near-dup by overlap — keep them.
    no_bands = survivors.join(bands.select(id_col).distinct(), id_col, "left_anti")
    novel = survivors.join(keep_ids, id_col, "left_semi").unionByName(no_bands)
    novel_bands = bands.join(novel.select(id_col), id_col, "left_semi")
    return novel, novel_bands


def start_ingest_dedup(
    stream_docs: DataFrame,
    root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
):
    """Attach the ingest-dedup sink to a streaming docs DataFrame.

    Layout under ``root``: ``accepted/epoch=N/`` (surviving docs) and
    ``index/epoch=N/`` (their band keys). Readers just read the
    directory trees; epoch partitioning exists for retry idempotency,
    not for resolution."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        index = _read_optional(spark, os.path.join(root, "index"))
        if index is not None:
            # REPLAY SAFETY (r7 review, same hole as cdc_ingest): a
            # crashed attempt of THIS epoch may already have written
            # index/epoch=N; treating its bands as "existing corpus"
            # would reject every replayed doc and the epoch overwrite
            # would erase the originals from accepted/ forever.
            index = index.filter(F.col("epoch") < epoch_id).select(
                "band", "band_key"
            )
        novel, novel_bands = dedup_batch_against_index(
            spark, batch_df, index, id_col, text_col
        )
        novel.write.mode("overwrite").parquet(
            os.path.join(root, "accepted", f"epoch={epoch_id}")
        )
        novel_bands.write.mode("overwrite").parquet(
            os.path.join(root, "index", f"epoch={epoch_id}")
        )

    writer = (
        stream_docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
