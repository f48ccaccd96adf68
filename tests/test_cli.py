"""CLI surface: list/run/explain over the query registry."""
from __future__ import annotations

from hrfco_data_pipeline_spark.__main__ import main


def test_list_filters(capsys):
    assert main(["list", "benford"]) == 0
    out = capsys.readouterr().out
    assert "orders_benford_digits" in out


def test_unknown_query_suggests(capsys):
    assert main(["run", "benford"]) == 2
    err = capsys.readouterr().err
    assert "orders_benford_digits" in err


def test_run_json(spark, capsys):
    rc = main(
        [
            "run",
            "events_value_bands",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--json",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip().startswith("{")
