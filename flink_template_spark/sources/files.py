"""File-format sources (SURVEY.md §2.1 "file formats" row — absent in
the reference, required for the engine's batch surface).

Explicit schemas always: schema inference reads the data twice and
guesses types — at 100 TB both are unacceptable. Malformed handling
follows the engine's drop-malformed convention (S6): mode=DROPMALFORMED
for CSV/JSON, consistent with the trip parse layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # parquet carries its schema; nothing to declare
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC carries its schema; vectorized reader + predicate pushdown are
    # on by default (spark.sql.orc.impl=native), same scan discipline as
    # parquet.
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_json_audit(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """PERMISSIVE variant: malformed lines are kept, not dropped, with
    the raw text captured in ``_corrupt_record`` — the data-quality
    audit path (quantify and quarantine bad input instead of silently
    shedding it; at 100 TB a rising corrupt-rate is an upstream alert).
    """
    full = schema + ", _corrupt_record STRING"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic benchmark/test stream (``timestamp``, ``value``) — the
    local stand-in for the Kafka source (S1) when no broker exists:
    same unbounded-source contract, same downstream plan."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
