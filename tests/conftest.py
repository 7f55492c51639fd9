from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ai_powered_e_commerce_analytics_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    yield spark


@pytest.fixture(autouse=True)
def _checkpoint_hygiene(request):
    """Drop localCheckpoint blocks left by iterative queries (CC,
    k-means, PageRank, RFM) after each test — the session is shared
    across ~200 tests and leaked blocks would otherwise crowd the
    unified memory region (same hygiene as bench.py's per-query
    unpersist). Only runs when the test actually used the session."""
    yield
    if "spark" in request.fixturenames:
        spark = request.getfixturevalue("spark")
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
