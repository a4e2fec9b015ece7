"""Smoke test for the jobs/explore.py CLI face (explore-raw-logs analog)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

import explore  # noqa: E402

from commerce_logs_pipeline_spark.plans.pipeline import run_pipeline
from commerce_logs_pipeline_spark.synth import generate_transcripts


def test_explore_subcommands(spark, tmp_path, capsys):
    base = str(tmp_path / "out")
    run_pipeline(spark, generate_transcripts(spark, 2_000, partitions=4), base)

    for argv in (
        ["--base", base, "--json", "filter", "--expr",
         "category = 'http' AND status_code >= 200", "--columns",
         "conv_id,turn_idx,status_code"],
        ["--base", base, "--json", "keys", "--prefix", "tool"],
        ["--base", base, "--json", "top", "--by", "category", "-n", "3"],
        ["--base", base, "--json", "stats"],
        ["--base", base, "--json", "profile", "--sample", "200"],
        ["--base", base, "--json", "pii"],
        ["--base", base, "--json", "pii", "--redact"],
    ):
        assert explore.main(argv, spark=spark) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out, argv
        import json

        json.loads(out[0])  # JSON-lines contract holds


def test_explore_keys_env_errors_when_column_absent(spark, tmp_path, capsys):
    """keys --env must ERROR when the routed table carries no environment
    column — r3 silently filtered `category` instead, returning
    confidently-wrong empty results."""
    import pytest

    base = str(tmp_path / "out")
    run_pipeline(spark, generate_transcripts(spark, 500, partitions=2), base)
    with pytest.raises(SystemExit, match="no 'environment' column"):
        explore.main(["--base", base, "keys", "--env", "prod"], spark=spark)
