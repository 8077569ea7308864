"""Local stand-in for the driver's DuckDB-oracle comparison.

Mirrors the documented driver semantics: run the Spark query and the
oracle SQL on the same parquet tables, then compare row count, column
names, and an order-insensitive value comparison with columns sorted by
name. We compare exactly (no float tolerance) so that any cross-engine
numeric instability is caught here, before the driver sees it.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _canon_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str, exact: bool = True):
    """Returns (ok, message)."""
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"

    s = _canon_rows([tuple(r) for r in spark_rows], spark_cols)
    d = _canon_rows(duck_rows, duck_cols)
    if s == d:
        return True, "exact match"

    # diagnose first diff
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            detail = []
            for x, y in zip(a, b):
                if x != y:
                    detail.append(f"{x!r} != {y!r}")
            return False, f"value mismatch at sorted-row {i}: {'; '.join(detail[:4])}"
    return False, "value mismatch (row ordering only?)"
