"""Safety-family operator tests (plans.safety): PII regex behavior on
known strings, redaction audit math, and bloom-decontamination
equivalence with the plain exact overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_template_spark.plans.safety import (
    PII_PATTERNS,
    pii_counts,
    pii_redact,
)


def test_pii_detect_counts_known_string(spark):
    text = (
        "reach me at a.b%x+1@mail-host.co or 10.20.30.40 "
        "phone 555-123-4567 ssn 987-65-4321 and again bob@x.io"
    )
    df = spark.createDataFrame([(text,)], "text STRING")
    row = df.select(*pii_counts(F.col("text"))).first()
    assert row.n_email == 2
    assert row.n_ipv4 == 1
    assert row.n_phone == 1
    assert row.n_ssn == 1


def test_pii_redact_replaces_and_preserves_rest(spark):
    text = "x 555-123-4567 y alice@example.com z"
    df = spark.createDataFrame([(text,)], "text STRING")
    out = df.select(pii_redact(F.col("text")).alias("r")).first().r
    assert out == "x <PHONE> y <EMAIL> z"


def test_pii_classes_do_not_cross_match(spark):
    # an SSN-shaped id is not a phone and vice versa; an IP is neither
    cases = {
        "987-65-4321": ("<SSN>",),
        "555-123-4567": ("<PHONE>",),
        "10.0.0.1": ("<IP>",),
    }
    for text, expect in cases.items():
        df = spark.createDataFrame([(text,)], "text STRING")
        out = df.select(pii_redact(F.col("text")).alias("r")).first().r
        assert out == expect[0], f"{text!r} -> {out!r}"


def test_pii_patterns_are_re2_safe():
    # DuckDB's regex engine is RE2: no backreferences or lookaround
    for _, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat


def test_decontaminate_bloom_equals_exact_overlap(spark):
    """The bloom prune is shuffle avoidance only: following it with the
    exact semi-join must reproduce the plain overlap exactly (bloom
    filters have no false negatives)."""
    from flink_template_spark.operators.bloom import bloom_prune

    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3}") for i in range(40)]
    train = spark.createDataFrame(rows[:30], "doc_id LONG, shingle STRING")
    bench = spark.createDataFrame(
        [(r[1],) for r in rows[25:]], "shingle STRING"
    ).distinct()

    pruned = bloom_prune(train, bench, "shingle", "shingle", expected_items=20)
    got = (
        pruned.join(bench, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        train.join(bench, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_pii_scrub(spark, tmp_path):
    """pii_redact / pii_counts are pure Column expressions, so the scrub
    pass drops straight into a stream: redacted text flows through, the
    per-class counts ride along as audit columns, and clean rows pass
    untouched."""
    import json

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        (1, "mail bob@example.com and 10.0.0.1 ok"),
        (2, "nothing sensitive here"),
        (3, "ssn 987-65-4321 call 555-123-4567"),
    ]
    (src / "p0.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
    )
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    scrubbed = stream.select(
        "doc_id", pii_redact(F.col("text")).alias("text"), *pii_counts(F.col("text"))
    )
    q = (
        scrubbed.writeStream.format("memory")
        .queryName("pii_scrub")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = {r.doc_id: r for r in spark.sql("SELECT * FROM pii_scrub").collect()}
    assert got[1].text == "mail <EMAIL> and <IP> ok"
    assert (got[1].n_email, got[1].n_ipv4) == (1, 1)
    assert got[2].text == "nothing sensitive here"
    assert got[2].n_email == got[2].n_phone == 0
    assert got[3].text == "ssn <SSN> call <PHONE>"
