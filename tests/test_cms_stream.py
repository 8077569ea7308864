"""Streaming CMS: the stream-maintained counter table must be
BIT-IDENTICAL to the batch sketch (counter addition commutes), point
estimates must dominate true counts, and compaction must preserve the
sketch exactly."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_template_spark.streaming.cms_stream import (
    compact_cms,
    estimate_counts,
    read_cms,
    write_cms_stream,
)

SCHEMA = "ts TIMESTAMP, event_type STRING, user_id LONG"


def _lines(rows):
    return "\n".join(json.dumps(r) for r in rows) + "\n"


def test_cms_stream_equals_batch_estimates_and_compaction(spark, tmp_path):
    in_dir = tmp_path / "in"
    sk_dir = tmp_path / "sk"
    ckpt = tmp_path / "ckpt"
    in_dir.mkdir()
    # skewed key frequencies split across two micro-batches
    f1 = [
        {"ts": "2024-01-01T00:00:00", "event_type": "click", "user_id": u % 7}
        for u in range(200)
    ]
    f2 = [
        {"ts": "2024-01-01T01:00:00", "event_type": "click", "user_id": 3}
        for _ in range(100)
    ] + [
        {"ts": "2024-01-01T01:01:00", "event_type": "view", "user_id": u}
        for u in range(50)
    ]
    (in_dir / "a.json").write_text(_lines(f1))
    (in_dir / "b.json").write_text(_lines(f2))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    q = write_cms_stream(
        stream, str(sk_dir), str(ckpt),
        item_expr="CAST(user_id AS STRING)", available_now=True,
    )
    q.awaitTermination(120)
    assert not q.isActive

    # stream sketch == batch sketch, counter for counter
    from flink_template_spark.operators.sketches_portable import (
        cms_counters,
        cms_merge,
    )

    batch = spark.read.schema(SCHEMA).json(str(in_dir))
    want = sorted(
        map(tuple, cms_merge(cms_counters(batch, [], "CAST(user_id AS STRING)"), []).collect())
    )
    got = sorted(map(tuple, read_cms(spark, str(sk_dir)).collect()))
    assert got == want

    # point estimates dominate true counts (CMS bound), and the heavy
    # key's estimate is exact unless it collides in EVERY row
    true = {
        r["user_id"]: r["cnt"]
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    keys = spark.createDataFrame(
        [(u,) for u in sorted(true)], "user_id LONG"
    )
    est = {
        r["user_id"]: r["est_count"]
        for r in estimate_counts(
            spark, str(sk_dir), keys, "CAST(user_id AS STRING)"
        ).collect()
    }
    for u, c in true.items():
        assert est[u] >= c, u
    # an unseen key with no collisions in at least one row estimates 0..
    # (with 1024 counters and ~57 distinct keys, collision in all 4
    # rows is astronomically unlikely — deterministic given the hash)
    unseen = spark.createDataFrame([(999_999,)], "user_id LONG")
    est0 = estimate_counts(spark, str(sk_dir), unseen, "CAST(user_id AS STRING)").first()
    assert est0["est_count"] == 0

    # compaction folds epochs into one base and preserves the sketch
    compact_cms(spark, str(sk_dir))
    assert (sk_dir / "base").exists()
    assert not (sk_dir / "changelog").exists()
    after = sorted(map(tuple, read_cms(spark, str(sk_dir)).collect()))
    assert after == want


def _run_two_epoch_stream(spark, tmp_path, sub):
    in_dir = tmp_path / sub / "in"
    sk_dir = tmp_path / sub / "sk"
    ckpt = tmp_path / sub / "ckpt"
    in_dir.mkdir(parents=True)
    f1 = [
        {"ts": "2024-01-01T00:00:00", "event_type": "click", "user_id": u % 5}
        for u in range(60)
    ]
    f2 = [
        {"ts": "2024-01-01T01:00:00", "event_type": "view", "user_id": u % 9}
        for u in range(40)
    ]
    (in_dir / "a.json").write_text(_lines(f1))
    (in_dir / "b.json").write_text(_lines(f2))
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    q = write_cms_stream(
        stream, str(sk_dir), str(ckpt),
        item_expr="CAST(user_id AS STRING)", available_now=True,
    )
    q.awaitTermination(120)
    assert not q.isActive
    want = sorted(map(tuple, read_cms(spark, str(sk_dir)).collect()))
    return sk_dir, want


def test_cms_compaction_crash_before_epoch_deletion(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER base_new is renamed into place but BEFORE the folded
    changelog epochs are deleted: with addition semantics a
    read-everything rule would double-count every folded epoch; the
    sidecar read rule must return the exact counters, and a re-run must
    heal the layout."""
    import flink_template_spark.streaming.changelog as CL

    sk_dir, want = _run_two_epoch_stream(spark, tmp_path, "w1")

    real_rmtree = CL.shutil.rmtree

    def crashing_rmtree(p, *a, **kw):
        if "changelog" in str(p) and "epoch=" in str(p):
            raise RuntimeError("simulated crash mid epoch deletion")
        return real_rmtree(p, *a, **kw)

    monkeypatch.setattr(CL.shutil, "rmtree", crashing_rmtree)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        compact_cms(spark, str(sk_dir))
    monkeypatch.setattr(CL.shutil, "rmtree", real_rmtree)

    # crash state: merged base + still-on-disk folded epochs
    assert (sk_dir / "base").exists()
    assert any((sk_dir / "changelog").iterdir())
    assert sorted(map(tuple, read_cms(spark, str(sk_dir)).collect())) == want

    compact_cms(spark, str(sk_dir))  # heals
    assert not (sk_dir / "changelog" / "epoch=0").exists()
    assert not (sk_dir / "base_old").exists()
    assert sorted(map(tuple, read_cms(spark, str(sk_dir)).collect())) == want


def test_cms_compaction_crash_between_base_renames(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER base is renamed aside to base_old but BEFORE
    base_new takes its place: the reader must fall back to base_old's
    counters plus its sidecar's unfolded-epoch rule, and a re-run must
    rebuild and heal."""
    import flink_template_spark.streaming.changelog as CL
    import flink_template_spark.streaming.cms_stream as CS

    sk_dir, want = _run_two_epoch_stream(spark, tmp_path, "w2")
    compact_cms(spark, str(sk_dir))  # establish a folded base first
    assert sorted(map(tuple, read_cms(spark, str(sk_dir)).collect())) == want

    # new epoch arrives after the first compaction
    extra = CS.cms_counters(
        spark.createDataFrame(
            [("click", 3)] * 25, "event_type STRING, user_id LONG"
        ),
        [],
        "CAST(user_id AS STRING)",
    )
    extra.repartition(1).write.mode("overwrite").parquet(
        str(sk_dir / "changelog" / "epoch=7")
    )
    want2 = sorted(map(tuple, read_cms(spark, str(sk_dir)).collect()))
    assert want2 != want

    real_rename = CL.os.rename

    def crashing_rename(src, dst):
        if str(dst).endswith("base") and str(src).endswith("base_new"):
            raise RuntimeError("simulated crash between base renames")
        return real_rename(src, dst)

    monkeypatch.setattr(CL.os, "rename", crashing_rename)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        compact_cms(spark, str(sk_dir))
    monkeypatch.setattr(CL.os, "rename", real_rename)

    # crash state: no base, base_old + base_new + untouched changelog
    assert not (sk_dir / "base").exists()
    assert (sk_dir / "base_old").exists() and (sk_dir / "base_new").exists()
    assert sorted(map(tuple, read_cms(spark, str(sk_dir)).collect())) == want2

    compact_cms(spark, str(sk_dir))  # heals: rebuild from base_old
    assert (sk_dir / "base").exists()
    assert not (sk_dir / "base_old").exists()
    assert not (sk_dir / "base_new").exists()
    assert sorted(map(tuple, read_cms(spark, str(sk_dir)).collect())) == want2
