from __future__ import annotations

from flink_template_spark import plans
from flink_template_spark.cli import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(plans.QUERIES)
    # oracle-backed queries are starred
    starred = {line[2:] for line in out if line.startswith("*")}
    assert starred == set(plans.ORACLES)


def test_cli_unknown_query_errors(capsys):
    assert main(["query", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_sql_udfs_inline_and_match_column_api(spark, sf_dir):
    """register_sql_functions: SQL UDF calls equal the Column-API duals
    and inline as pure expressions (no Python eval in the plan)."""
    from pyspark.sql import functions as F

    from flink_template_spark.functions.geo import haversine_km
    from flink_template_spark.functions.text import token_count_ws
    from flink_template_spark.sql import register_sql_functions, run_sql

    register_sql_functions(spark)
    via_sql = run_sql(
        spark,
        sf_dir,
        """SELECT doc_id, token_count_ws(text) AS n_tok,
                  md5_bucket(CAST(doc_id AS STRING), 100) AS bucket
           FROM documents ORDER BY doc_id LIMIT 50""",
    )
    from flink_template_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    via_col = (
        docs.select(
            "doc_id",
            token_count_ws(F.col("text")).alias("n_tok"),
            (
                F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
                % 100
            ).alias("bucket"),
        )
        .orderBy("doc_id")
        .limit(50)
    )
    assert [tuple(r) for r in via_sql.collect()] == [tuple(r) for r in via_col.collect()]

    plan = via_sql._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    d = spark.sql("SELECT haversine_km(19.4, -99.1, 19.5, -99.2) AS d").first().d
    d2 = (
        spark.range(1)
        .select(haversine_km(F.lit(19.4), F.lit(-99.1), F.lit(19.5), F.lit(-99.2)).alias("d"))
        .first()
        .d
    )
    assert abs(d - d2) < 1e-9
    # bug-compat variant equals its Column-API dual (quirk Q6 preserved)
    from flink_template_spark.functions.geo import haversine_km_bug_compat

    dref = spark.sql("SELECT haversine_km_ref(19.4, -99.1, 19.5, -99.2) AS d").first().d
    dref2 = (
        spark.range(1)
        .select(
            haversine_km_bug_compat(
                F.lit(19.4), F.lit(-99.1), F.lit(19.5), F.lit(-99.2)
            ).alias("d")
        )
        .first()
        .d
    )
    assert abs(dref - dref2) < 1e-9 and abs(dref - d) > 0.1  # and differs from fixed


def test_cli_trip_pipeline_progress_log(spark, tmp_path):
    """VERDICT r8 next #8: `trip-pipeline --progress-log FILE` ships the
    bounded per-batch ledger (JSONL) plus a final totals line — the
    observability the reference's hot-path debug log
    (TripAggregatorApplication.kt:67) never had."""
    import json

    from flink_template_spark.sources.trip_fixtures import write_scaled_fixture

    src = tmp_path / "events"
    n_events = write_scaled_fixture(
        str(src), n_trips=20, events_per_trip=5, n_shards=2
    )
    log = tmp_path / "progress.jsonl"
    rc = main(
        [
            "trip-pipeline",
            "--source", str(src),
            "--checkpoint", str(tmp_path / "ckpt"),
            # generous: under a loaded machine (parallel suite runs)
            # batch 0 must still fit inside the run window
            "--timeout", "25",
            "--progress-log", str(log),
        ]
    )
    assert rc == 0
    lines = [json.loads(x) for x in log.read_text().splitlines()]
    assert lines, "ledger is empty"
    *records, last = lines
    assert "totals" in last
    assert last["totals"]["n_batches"] == len(records)
    # every input row passed through the recorded batches
    assert last["totals"]["num_input_rows"] == n_events
    assert all("batch_id" in r and "state_rows" in r for r in records)
