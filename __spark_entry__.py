"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``flink_template_spark.plans`` (one module per
operator family); this file just re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_session_conf(spark: SparkSession) -> None:
    """Session confs the oracle comparison depends on.

    UTC timezone makes Spark's timestamp rendering match DuckDB's
    naive-UTC timestamps. nanosAsLong is defensive only: the testdata's
    events.ts is TIMESTAMP(MICROS) (read natively); a TIMESTAMP(NANOS)
    input would surface as int64 and tables.load_events normalizes it.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the pricing-summary scan+agg (the engine's TPC-H Q1 shape):
    exercises parquet scan, predicate pushdown, decimal-exact hash
    aggregation.
    """
    _ensure_session_conf(spark)
    from flink_template_spark import plans

    return plans.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.7."""
    from flink_template_spark import plans

    def wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_session_conf(spark)
            return fn(spark, sf_dir)

        return runner

    return {name: wrap(fn) for name, fn in plans.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted ⇒ rows-only check."""
    from flink_template_spark import plans

    return dict(plans.ORACLES)
