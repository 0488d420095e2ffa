"""Shared fixtures: one SparkSession per test session (JVM startup is
~9 s — never per-test), plus golden graphs from the reference corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paralleltrianglecounting_spark.session import get_spark

REFERENCE_GRAPHS = "/root/reference/graph_file"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest-link-graph", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return f"{TESTDATA}/sf0.001"


@pytest.fixture(scope="session")
def sf_small() -> str:
    return f"{TESTDATA}/sf0.01"


def reference_graph(name: str) -> str:
    path = f"{REFERENCE_GRAPHS}/{name}.g"
    if not os.path.exists(path):
        pytest.skip(f"reference graph {name} not available")
    return path
