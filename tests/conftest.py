from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ue_big_data_project_spark import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Test-session-only parallelism shaping (suite wall-clock, round-12
    # verdict task 1). A 1-row ``createDataFrame([...])`` fixture
    # becomes a PYTHON-backed RDD with ``defaultParallelism``
    # partitions; on local[32] every materialization then pays ~32
    # Python partition computes (~140 ms each — measured 4.6 s for a
    # one-row parquet staging write, 0.5 s with 2 slices). Hundreds of
    # tests stage such fixtures, so cap ``spark.default.parallelism``
    # at 2 for the TEST session while explicitly pinning scan and SQL
    # leaf parallelism back up so genuinely parallel work (media
    # decode over parquet, range-synthesized payloads) keeps its
    # cores. Production/bench sessions are untouched — this is test
    # harness shaping, not engine tuning.
    s = get_spark(
        app_name="engine-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.default.parallelism": "2",
            "spark.sql.leafNodeDefaultParallelism": "16",
            "spark.sql.files.minPartitionNum": "16",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
