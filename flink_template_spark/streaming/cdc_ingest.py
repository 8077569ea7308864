"""Streaming CDC chunk-store ingest — incremental storage dedup.

The streaming complement of the batch CDC dedup audit
(plans.text_dedup.q_cdc_chunk_dedup): documents arrive as a stream and
the corpus keeps a persisted CHUNK STORE keyed by the 60-bit chunk
hash. Each micro-batch:

1. chunks the incoming docs with the SAME content-defined chunking
   pass the batch audit uses (plans.text_dedup.cdc_chunk_table — one
   implementation, bit-identical boundaries in both tiers);
2. looks each chunk hash up in the store — already-present chunks cost
   ZERO new storage (the dedup hit, exactly like a dedup filesystem's
   write path);
3. within the batch, the first occurrence (lowest guarded
   doc_id·2^31+chunk_idx key) of a novel hash is the one stored;
4. appends the novel chunks to the store and a per-document manifest
   row (n_chunks, n_new, chars_total, chars_new) to the stats
   directory — the manifest is what reassembles documents from the
   store, and the stats stream is the live dedup-ratio dashboard.

Epoch-stamped output directories make retries idempotent (a replayed
epoch overwrites its own directories) — the streaming.rollup /
streaming.ingest_dedup contract.

Scale: per-batch work is chunks(batch) ⋈ store on the 60-bit hash — an
equi-join on fixed-width keys (chunk TEXT travels only for novel
chunks, once each); the store is O(unique content) and
range-partitionable by hash. Nothing collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.functions.hashing import md5int_spark
from flink_template_spark.plans.text_dedup import (
    cdc_checked_key,
    cdc_chunk_table,
)
from flink_template_spark.streaming.io_util import read_optional as _read_optional


def chunk_store(spark: SparkSession, root: str) -> DataFrame:
    """The accumulated chunk store: (chash, clen, ctext)."""
    df = _read_optional(spark, os.path.join(root, "chunks"))
    if df is None:
        raise FileNotFoundError(f"no chunk store under {root}")
    return df.drop("epoch")


def doc_stats(spark: SparkSession, root: str) -> DataFrame:
    """Per-document ingest accounting: (doc_id, source, n_chunks,
    n_new, chars_total, chars_new)."""
    df = _read_optional(spark, os.path.join(root, "stats"))
    if df is None:
        raise FileNotFoundError(f"no ingest stats under {root}")
    return df.drop("epoch")


def ingest_batch_against_store(
    batch: DataFrame, store: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """Pure batch core (unit-testable without a stream): returns
    (novel_chunks, per_doc_stats) given incoming docs (doc_id, text,
    source) and the current store (None = empty). novel_chunks carries
    (chash, clen, ctext); stats counts every incoming chunk and which
    of them cost new storage."""
    # cache: the lag-window chunking pass is the dominant batch cost and
    # feeds BOTH the novel write and the stats write (the sibling
    # ingest_dedup caches its band table for the same reason)
    chunks = cdc_chunk_table(batch, extra_cols=("source",)).select(
        "doc_id",
        "source",
        "chunk_idx",
        "ctext",
        F.length("ctext").alias("clen"),
        F.expr(md5int_spark("ctext", bits=60)).alias("chash"),
        cdc_checked_key().alias("key"),
    ).cache()

    # (2) chunks whose hash is already stored cost nothing new
    if store is not None:
        known = store.select("chash").distinct()
        fresh = chunks.join(known, "chash", "left_anti")
    else:
        fresh = chunks

    # (3) within-batch first occurrence of each novel hash wins storage
    firsts = fresh.groupBy("chash").agg(F.min("key").alias("min_key")).cache()
    novel = (
        fresh.join(firsts, "chash")
        .filter(F.col("key") == F.col("min_key"))
        .select("chash", "clen", "ctext")
    )

    is_new = F.col("key") == F.coalesce(F.col("min_key"), F.lit(-1))
    stats = (
        chunks.join(firsts, "chash", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint").alias("n_new"),
            F.sum("clen").cast("bigint").alias("chars_total"),
            F.sum(F.when(is_new, F.col("clen")).otherwise(0))
            .cast("bigint")
            .alias("chars_new"),
        )
    )
    return novel, stats


def process_epoch(batch_df: DataFrame, epoch_id: int, root: str) -> None:
    """One epoch of the ingest (module-level so tests can replay it).

    REPLAY SAFETY (r7 review): the store read excludes the CURRENT
    epoch's own directory. A crashed attempt of epoch N may have
    already written chunks/epoch=N; re-reading those hashes as
    "already stored" would empty the novel set, and the overwrite of
    epoch=N would then DELETE the only copies — the manifest could
    never reassemble those documents again. Filtering to epoch <
    epoch_id makes the replay recompute the identical novel set and
    overwrite epoch=N with the same content (idempotent), which is the
    property the epoch-stamped layout exists to provide."""
    spark = batch_df.sparkSession
    store = _read_optional(spark, os.path.join(root, "chunks"))
    if store is not None:
        store = store.filter(F.col("epoch") < epoch_id).select("chash")
    novel, stats = ingest_batch_against_store(batch_df, store)
    novel.write.mode("overwrite").parquet(
        os.path.join(root, "chunks", f"epoch={epoch_id}")
    )
    stats.write.mode("overwrite").parquet(
        os.path.join(root, "stats", f"epoch={epoch_id}")
    )


def start_cdc_ingest(
    stream_docs: DataFrame,
    root: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Attach the chunk-store ingest sink to a streaming docs
    DataFrame (doc_id, text, source). Layout under ``root``:
    ``chunks/epoch=N/`` (novel chunk payloads) and ``stats/epoch=N/``
    (per-doc manifest rows); epoch partitioning is retry idempotency,
    not resolution."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_epoch(batch_df, epoch_id, root)

    writer = (
        stream_docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
