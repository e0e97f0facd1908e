from __future__ import annotations

import os

import pytest

from split_kinesis_streams_with_glue_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def envelope_fixture_dir(spark, sf_dir, tmp_path_factory):
    """Mixed multi-table CDC envelope stream, written once per test session."""
    from split_kinesis_streams_with_glue_spark.envelope import write_envelope_fixture

    out = str(tmp_path_factory.mktemp("envelopes") / "stream")
    write_envelope_fixture(spark, sf_dir, out)
    return out
