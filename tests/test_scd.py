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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(  # (key, segment_idx, balance_int)
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    dim_keys=st.sets(st.integers(min_value=1, max_value=6), min_size=1, max_size=6),
)
def test_property_scd2_invariants(spark, data, dim_keys):
    """For ANY current dimension and ANY update batch: exactly one
    current version per live key; closed rows get the effective date;
    unchanged updates cause zero churn; total row delta = number of
    actually-changed keys + brand-new keys."""
    segs = ["A", "B", "C"]
    dim_rows = [
        (k, segs[k % 3], float(k * 10), "2020-01-01", "9999-12-31", True)
        for k in sorted(dim_keys)
    ]
    dim = spark.createDataFrame(
        dim_rows,
        "cust_id long, segment string, balance double, "
        "valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "cust_id", "segment", "balance",
        "CAST(valid_from AS DATE) valid_from",
        "CAST(valid_to AS DATE) valid_to", "is_current",
    )
    upd_rows = [(k, segs[si], float(b * 7)) for k, si, b in data]
    updates = spark.createDataFrame(
        upd_rows or [(None, None, None)], "cust_id long, segment string, balance double"
    ).filter("cust_id IS NOT NULL")

    out = scd2_merge(
        dim, updates, "cust_id", ["segment", "balance"], F.lit("2024-03-01")
    ).collect()

    old = {k: (segs[k % 3], float(k * 10)) for k in dim_keys}
    changed = {
        k for k, si, b in data if k in old and old[k] != (segs[si], float(b * 7))
    }
    new_keys = {k for k, _, _ in data if k not in old}

    assert len(out) == len(dim_keys) + len(changed) + len(new_keys)
    cur = [r for r in out if r.is_current]
    assert len(cur) == len(dim_keys | new_keys)  # one current per live key
    assert {r.cust_id for r in cur} == dim_keys | new_keys
    for r in out:
        if not r.is_current:
            assert str(r.valid_to) == "2024-03-01" and r.cust_id in changed
