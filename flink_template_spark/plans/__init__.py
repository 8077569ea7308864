"""Declared query library (SURVEY.md §2.7) + DuckDB oracle SQL.

Importing this package registers every query module into
``flink_template_spark.plans.registry``.
"""

from flink_template_spark.plans import registry  # noqa: F401
from flink_template_spark.plans import relational  # noqa: F401
from flink_template_spark.plans import windows_analytic  # noqa: F401
from flink_template_spark.plans import events_time  # noqa: F401
from flink_template_spark.plans import telemetry  # noqa: F401
from flink_template_spark.plans import text_dedup  # noqa: F401
from flink_template_spark.plans import vectors  # noqa: F401
from flink_template_spark.plans import trip_pipeline  # noqa: F401
from flink_template_spark.plans import subqueries  # noqa: F401
from flink_template_spark.plans import multimodal  # noqa: F401
from flink_template_spark.plans import functions_ext  # noqa: F401
from flink_template_spark.plans import datapipe  # noqa: F401
from flink_template_spark.plans import variant  # noqa: F401

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
