from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_tags_etl_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("spotify-tags-etl-spark-tests", master="local[8]")
    # r12 ADVICE: the exchange-count pins assume the scale-adaptive scan
    # fan-out FIRES on the single-split fixtures — which requires more
    # than one core. A runner at local[1] (or with FAN_TASK_BYTES
    # overridden large) would flip dozens of pins with confusing
    # mismatches; fail loud with the actual precondition instead.
    assert spark.sparkContext.defaultParallelism > 1, (
        "plan pins require defaultParallelism > 1 (the scan fan-out "
        "must fire on single-split fixtures); run tests on local[N>1]"
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
