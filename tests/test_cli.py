"""CLI front door (python -m oem_gateway_spark): list / oracle are
session-free; sql shares the test session via getOrCreate."""

from __future__ import annotations

from oem_gateway_spark.__main__ import main


def test_cli_list_and_oracle(capsys):
    assert main(["list", "q1_"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "[oracle]" in out

    assert main(["oracle", "q1_pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "FROM lineitem" in out

    assert main(["oracle", "nope"]) == 2


def test_cli_sql_runs_over_catalog_views(spark, capsys):
    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM lineitem",
            "--sf",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "n" in out and any(ch.isdigit() for ch in out)
