"""SQL text interface: the engine's tables as temp views + ad-hoc ANSI
SQL through Catalyst.

The reference has no SQL surface (SURVEY.md §2.5); this is the engine
capability that makes every relational query in the library — and
anything a user writes — available as plain SQL with identical plans
(Catalyst compiles both paths to the same physical operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_template_spark.tables import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the testdata views (same names the DuckDB oracle uses)
    and run ``query``; most oracle SQL runs verbatim here too."""
    register_views(spark, sf_dir)
    return spark.sql(query)
