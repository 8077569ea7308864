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
