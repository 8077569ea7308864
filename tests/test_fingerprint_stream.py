"""Streaming content fingerprints: the maintained state must equal the
batch fingerprint of everything ingested (bit-for-bit), survive
compaction unchanged, and detect a corrupted replica."""

from __future__ import annotations

import json


SCHEMA = "doc_id LONG, lang STRING, n_chars LONG, text STRING, source STRING"


def _lines(rows):
    return "\n".join(json.dumps(r) for r in rows) + "\n"


def _doc(i, source, text=None):
    return {
        "doc_id": i,
        "lang": "en" if i % 3 else "de",
        "n_chars": 50 + i,
        "text": text if text is not None else f"doc body {i} tokens here",
        "source": source,
    }


def test_fingerprint_stream_equals_batch_and_compacts(spark, tmp_path):
    from flink_template_spark.plans import functions_ext as FE
    from flink_template_spark.streaming.fingerprint_stream import (
        compact_fingerprints,
        read_fingerprints,
        write_fingerprint_stream,
    )

    in_dir = tmp_path / "in"
    st_dir = tmp_path / "st"
    ckpt = tmp_path / "ckpt"
    in_dir.mkdir()
    f1 = [_doc(i, "web") for i in range(40)] + [
        _doc(100 + i, "books") for i in range(10)
    ]
    f2 = [_doc(200 + i, "web") for i in range(25)]
    (in_dir / "a.json").write_text(_lines(f1))
    (in_dir / "b.json").write_text(_lines(f2))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    q = write_fingerprint_stream(
        stream, str(st_dir), str(ckpt), available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive

    # the maintained state equals the batch fingerprint of all rows,
    # via the batch query on the same data (monkeypatch-free: run the
    # batch aggregation helper directly on the full input)
    from flink_template_spark.streaming.fingerprint_stream import (
        _batch_fingerprints,
    )

    batch = spark.read.schema(SCHEMA).json(str(in_dir))
    want = sorted(map(tuple, _batch_fingerprints(batch).collect()))
    got = sorted(map(tuple, read_fingerprints(spark, str(st_dir)).collect()))
    assert got == want

    compact_fingerprints(spark, str(st_dir))
    assert (st_dir / "base").exists()
    assert not (st_dir / "changelog").exists()
    after = sorted(map(tuple, read_fingerprints(spark, str(st_dir)).collect()))
    assert after == want

    # integrity check in action: a replica with one corrupted row
    # disagrees in xor_fp for that source only
    corrupted = [
        (dict(r, text="TAMPERED") if r["doc_id"] == 3 else r)
        for r in f1 + f2
    ]
    rep = spark.createDataFrame(
        [tuple(r[k] for k in ("doc_id", "lang", "n_chars", "text", "source"))
         for r in corrupted],
        SCHEMA,
    )
    rep_fp = {r["source"]: r for r in _batch_fingerprints(rep).collect()}
    good_fp = {r[0]: r for r in got}
    assert rep_fp["web"]["xor_fp"] != good_fp["web"][2]
    assert rep_fp["web"]["n_rows"] == good_fp["web"][1]  # same row count
    assert rep_fp["books"]["xor_fp"] == good_fp["books"][2]  # untouched
