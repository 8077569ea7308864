from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_template_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle_check import duckdb_conn

    return duckdb_conn(sf_dir)


def plan_formatted(spark, plans_mod, sf_dir: str, name: str) -> str:
    """Formatted explain text of a registered query — the shared
    helper behind the r10/r11 plan-shape pins."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans_mod.QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def parquet_scan_count(p: str) -> int:
    import re

    return len(re.findall(r"\(\d+\) Scan parquet", p))
