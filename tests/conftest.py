from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_logs_pipeline_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="clp-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_10k(spark):
    from commerce_logs_pipeline_spark.synth import generate_transcripts

    return generate_transcripts(spark, 10_000, partitions=8).cache()


@pytest.fixture(scope="session")
def parsed_10k(transcripts_10k):
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts

    return parse_transcripts(transcripts_10k).cache()
