"""SCD2 merge: change closes + reopens, no-op keeps, new key opens,
history untouched; as-of view picks the right version."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_template_spark.operators.scd import scd2_as_of, scd2_merge

DIM_SCHEMA = (
    "cust_id long, segment string, balance double, "
    "valid_from string, valid_to string, is_current boolean"
)
UPD_SCHEMA = "cust_id long, segment string, balance double"


def _dim(spark):
    return spark.createDataFrame(
        [
            # key 1: one closed + one open version (history)
            (1, "BUILDING", 10.0, "2020-01-01", "2022-01-01", False),
            (1, "MACHINERY", 20.0, "2022-01-01", "9999-12-31", True),
            # key 2: open only
            (2, "FURNITURE", 5.0, "2021-06-01", "9999-12-31", True),
            # key 3: open only, will be absent from updates
            (3, "HOUSEHOLD", 7.0, "2021-01-01", "9999-12-31", True),
        ],
        DIM_SCHEMA,
    ).withColumn("valid_from", F.col("valid_from").cast("date")).withColumn(
        "valid_to", F.col("valid_to").cast("date")
    )


def test_scd2_merge_semantics(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [
            (1, "MACHINERY", 25.0),   # balance changed → new version
            (2, "FURNITURE", 5.0),    # identical → no-op
            (9, "AUTOMOBILE", 1.0),   # new key → first version
        ],
        UPD_SCHEMA,
    )
    out = scd2_merge(
        dim, updates, "cust_id", ["segment", "balance"], F.lit("2024-03-01")
    ).cache()

    rows = {(r.cust_id, str(r.valid_from)): r for r in out.collect()}
    assert out.count() == 6  # 4 original + 1 reopened + 1 new

    closed = rows[(1, "2022-01-01")]
    assert not closed.is_current and str(closed.valid_to) == "2024-03-01"
    reopened = rows[(1, "2024-03-01")]
    assert reopened.is_current and reopened.balance == 25.0
    assert rows[(2, "2021-06-01")].is_current  # no-op: untouched
    assert rows[(3, "2021-01-01")].is_current  # absent from updates: kept
    assert rows[(9, "2024-03-01")].is_current  # new key opened
    assert not rows[(1, "2020-01-01")].is_current  # history untouched

    # exactly one current version per live key
    cur = out.filter("is_current").groupBy("cust_id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_as_of_view(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame([(1, "MACHINERY", 25.0)], UPD_SCHEMA)
    out = scd2_merge(
        dim, updates, "cust_id", ["segment", "balance"], F.lit("2024-03-01")
    )
    v2021 = {
        r.cust_id: r.balance
        for r in scd2_as_of(out, "cust_id", F.lit("2021-01-01")).collect()
    }
    assert v2021[1] == 10.0  # first version ruled in 2021
    v2024 = {
        r.cust_id: r.balance
        for r in scd2_as_of(out, "cust_id", F.lit("2024-06-01")).collect()
    }
    assert v2024[1] == 25.0  # post-merge version
