"""Shared pytest fixtures: one SparkSession per test session, plus
deterministic synthetic crawl fixtures (seed=42) written once to a tmp dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawl_spark.fixtures import write_fixtures  # noqa: E402
from commoncrawl_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cc-spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("cc_fixtures"))
    write_fixtures(out, n_pages=400, seed=42)
    return out


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA
