"""Streaming CUSUM drift monitor: the stream's final per-source state
must equal the one-pass integer fold over the same ordered rows
(micro-batch boundaries invisible), a sustained shift must alarm, and
an in-control source must not."""

from __future__ import annotations

import json

from flink_template_spark.streaming.drift import (
    SCALE,
    cusum_fold,
    monitor_stream,
)

SCHEMA = "doc_id LONG, source STRING, n_chars LONG"

MU, SLACK, H = 100.0, 5.0, 300.0


def _lines(rows):
    return "\n".join(json.dumps(r) for r in rows) + "\n"


def _rows():
    steady = [
        {"doc_id": i, "source": "ok", "n_chars": 100 + (i % 7) - 3}
        for i in range(120)
    ]
    # 'drifty' runs in-control for 40 docs then shifts +20 for 80 docs:
    # each shifted doc adds ~ (20-5)*SCALE to s_hi -> crosses H fast
    drifty = [
        {"doc_id": 1000 + i, "source": "drifty",
         "n_chars": (100 if i < 40 else 120) + (i % 5) - 2}
        for i in range(120)
    ]
    return steady, drifty


def test_cusum_stream_equals_fold_and_alarms(spark, tmp_path):
    in_dir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    in_dir.mkdir()
    steady, drifty = _rows()
    # two micro-batches with contiguous doc ranges per file: the fold
    # must be invariant to the batch split
    half = len(steady) // 2
    (in_dir / "a.json").write_text(_lines(steady[:half] + drifty[:half]))
    (in_dir / "b.json").write_text(_lines(steady[half:] + drifty[half:]))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    q = (
        monitor_stream(stream, MU, SLACK, H)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    # update mode: keep each source's LAST emitted row
    got = {}
    for r in spark.sql(
        "SELECT * FROM cusum ORDER BY n_seen"
    ).collect():
        got[r["source"]] = (
            r["s_hi"], r["s_lo"], r["n_seen"], r["n_alarms"]
        )

    mu_s, k_s, h_s = round(MU * SCALE), round(SLACK * SCALE), round(H * SCALE)
    for name, rows in (("ok", steady), ("drifty", drifty)):
        vals = [r["n_chars"] * SCALE for r in sorted(rows, key=lambda r: r["doc_id"])]
        assert got[name] == cusum_fold(vals, mu_s, k_s, h_s), name

    assert got["ok"][3] == 0  # in-control: no alarms
    assert got["drifty"][3] >= 1  # sustained +20 shift: alarms


def test_cusum_fold_reference_behavior():
    """Hand-checked fold: slack absorbs in-control noise; one-sided
    accumulation resets after each alarm."""
    mu_s, k_s, h_s = 100 * SCALE, 5 * SCALE, 30 * SCALE
    # exactly on-mean values never accumulate
    assert cusum_fold([100 * SCALE] * 50, mu_s, k_s, h_s) == (0, 0, 50, 0)
    # +10 shift: each step adds 5*SCALE to s_hi; alarm after 7 steps
    # (7*5=35 > 30), then the side resets and re-accumulates
    s = cusum_fold([110 * SCALE] * 7, mu_s, k_s, h_s)
    assert s[3] == 1 and s[0] == 0
    # low-side shift mirrors
    s = cusum_fold([90 * SCALE] * 7, mu_s, k_s, h_s)
    assert s[3] == 1 and s[1] == 0


def test_cusum_fractional_values_keep_centi_precision(spark, tmp_path):
    """ADVICE r6: a fractional value column must be scaled THEN
    rounded, not floor-truncated to long before the ×SCALE. A steady
    +0.6 offset over mu is invisible under truncation (0.6 floors to
    0) but accumulates 60-slack per step once centi-precision is kept;
    with slack=0.1 and h=30 it must alarm within 120 rows."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        {"doc_id": i, "source": "frac", "n_chars": 100.6} for i in range(120)
    ]
    (in_dir / "a.json").write_text(_lines(rows))

    stream = spark.readStream.schema(
        "doc_id LONG, source STRING, n_chars DOUBLE"
    ).json(str(in_dir))
    q = (
        monitor_stream(stream, 100.0, 0.1, 30.0)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_frac")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cusum_frac").collect()[0]

    vals = [round(100.6 * SCALE)] * 120  # = 10060, not 10000
    exp = cusum_fold(
        vals, round(100.0 * SCALE), round(0.1 * SCALE), round(30.0 * SCALE)
    )
    assert (got["s_hi"], got["s_lo"], got["n_seen"], got["n_alarms"]) == exp
    assert exp[3] >= 1  # the fractional drift actually alarms


def test_cusum_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state must carry across a checkpointed
    restart: stop after batch 1, append new data, restart with the
    SAME checkpoint — the final state equals the one-pass fold over
    all rows (no reprocessing, no reset)."""
    in_dir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    in_dir.mkdir()
    steady, drifty = _rows()
    half = len(steady) // 2
    (in_dir / "a.json").write_text(_lines(steady[:half] + drifty[:half]))

    out_dir = tmp_path / "out"

    def start():
        # memory sink cannot recover from a checkpoint; foreachBatch
        # appending the emitted state rows can
        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(str(out_dir))

        stream = spark.readStream.schema(SCHEMA).json(str(in_dir))
        return (
            monitor_stream(stream, MU, SLACK, H)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(120)
    assert not q.isActive

    (in_dir / "b.json").write_text(_lines(steady[half:] + drifty[half:]))
    q = start()
    q.awaitTermination(120)
    assert not q.isActive

    # last emitted row per source = the one with max n_seen
    got = {}
    for r in sorted(
        spark.read.parquet(str(out_dir)).collect(), key=lambda r: r["n_seen"]
    ):
        got[r["source"]] = (r["s_hi"], r["s_lo"], r["n_seen"], r["n_alarms"])

    mu_s, k_s, h_s = round(MU * SCALE), round(SLACK * SCALE), round(H * SCALE)
    for name, rows in (("ok", steady), ("drifty", drifty)):
        vals = [
            r["n_chars"] * SCALE
            for r in sorted(rows, key=lambda r: r["doc_id"])
        ]
        assert got[name] == cusum_fold(vals, mu_s, k_s, h_s), name


def test_cusum_large_integer_values_stay_exact(spark, tmp_path):
    """r7 self-review: integer-typed values must scale as exact long
    multiplies, never through double — a counter above 2^53 loses its
    low digits to the double mantissa and the CUSUM sums silently
    diverge from the integer reference fold. Planted: values around
    10^16 + small offsets whose doubles collapse to the same number."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = 10_000_000_000_000_001  # > 2^53; 1e16 as a double drops the +1
    rows = [
        {"doc_id": i, "source": "big", "n_chars": base + i} for i in range(50)
    ]
    (in_dir / "a.json").write_text(_lines(rows))

    mu, slack, h = float(base), 0.0, 1e18
    stream = spark.readStream.schema(SCHEMA).json(str(in_dir))
    q = (
        monitor_stream(stream, mu, slack, h)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_big")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cusum_big").collect()[0]

    vals = [(base + i) * SCALE for i in range(50)]  # exact ints
    exp = cusum_fold(vals, round(mu * SCALE), 0, round(h * SCALE))
    assert (got["s_hi"], got["s_lo"], got["n_seen"], got["n_alarms"]) == exp
    # the planted offsets are REAL in the state (a double-typed value
    # path would zero them): mu itself rounds to 1e16 as a double, so
    # every row sits (i+1) ABOVE it — including the +1 the double
    # representation of base drops
    assert got["s_hi"] == sum((i + 1) * SCALE for i in range(50))


def test_cusum_fractional_tie_rounds_like_reference_params(spark, tmp_path):
    """r7 self-review: a .5-tie value must quantize with the SAME
    HALF_EVEN rule Python's round applies to mu — otherwise a stream
    sitting exactly on its reference mean accumulates +1 scaled unit
    per row and eventually false-alarms. mu=100.125 → 10012.5 → 10012
    under ties-to-even; every value 100.125 must also scale to 10012,
    leaving the monitor exactly in control."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        {"doc_id": i, "source": "tie", "n_chars": 100.125} for i in range(200)
    ]
    (in_dir / "a.json").write_text(_lines(rows))

    stream = spark.readStream.schema(
        "doc_id LONG, source STRING, n_chars DOUBLE"
    ).json(str(in_dir))
    q = (
        monitor_stream(stream, 100.125, 0.0, 30.0)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_tie")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cusum_tie").collect()[0]
    assert (got["s_hi"], got["s_lo"], got["n_alarms"]) == (0, 0, 0)


def test_cusum_double_headroom_fails_loudly(spark, tmp_path):
    """ADVICE r7: the fractional path must apply the same loud
    assert_true headroom guard as the integer path — a double beyond
    2^63/SCALE would otherwise silently clamp to Long.MaxValue on the
    cast and corrupt the CUSUM sums instead of failing."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    too_big = float((1 << 63) // SCALE) * 4.0  # past the scaled-long range
    rows = [{"doc_id": 0, "source": "boom", "n_chars": too_big}]
    (in_dir / "a.json").write_text(_lines(rows))

    stream = spark.readStream.schema(
        "doc_id LONG, source STRING, n_chars DOUBLE"
    ).json(str(in_dir))
    q = (
        monitor_stream(stream, 100.0, 0.0, 30.0)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_boom")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="headroom"):
        q.awaitTermination(120)


def test_cusum_double_headroom_boundary_is_clamp_safe(spark, tmp_path):
    """r8 self-review: float((2^63)//SCALE - 1) rounds UP past the true
    bound, so the representable double AT that rounded value passed the
    old guard yet still clamped on the long cast. The guard now steps
    one ulp down; this exact boundary double must fail loudly."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    boundary = float((1 << 63) // SCALE - 1)  # rounds UP: clamp-unsafe
    rows = [{"doc_id": 0, "source": "edge", "n_chars": boundary}]
    (in_dir / "a.json").write_text(_lines(rows))

    stream = spark.readStream.schema(
        "doc_id LONG, source STRING, n_chars DOUBLE"
    ).json(str(in_dir))
    q = (
        monitor_stream(stream, 100.0, 0.0, 30.0)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_edge")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="headroom"):
        q.awaitTermination(120)


def test_cusum_null_value_fails_loudly(spark, tmp_path):
    """ADVICE r8: a NULL metric value is a data defect in a monitoring
    stream — the guard rejects it explicitly (documented contract, not
    a side effect of assert_true's NULL-condition semantics). Pinned
    for both the integer and the double path."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    for ii, dtype in enumerate(("LONG", "DOUBLE")):
        in_dir = tmp_path / f"in_{dtype}"
        in_dir.mkdir()
        rows = [
            {"doc_id": 0, "source": "ok", "n_chars": 100},
            {"doc_id": 1, "source": "ok", "n_chars": None},
        ]
        (in_dir / "a.json").write_text(_lines(rows))
        stream = spark.readStream.schema(
            f"doc_id LONG, source STRING, n_chars {dtype}"
        ).json(str(in_dir))
        q = (
            monitor_stream(stream, MU, SLACK, H)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(f"cusum_null_{ii}")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException, match="NULL"):
            q.awaitTermination(120)
