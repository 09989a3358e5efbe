from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_to_parquet_writer_spark.config import EngineConfig
from redpanda_to_parquet_writer_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # driver_memory: Spark's 1g local-mode default OOMs under the sf1
    # streaming-twin tests (TaskResultLost -> STREAM_FAILED, the same
    # heap class the r10 sf1 sweep hit); must be set at FIRST session
    # creation — the JVM heap cannot grow after launch
    cfg = EngineConfig(shuffle_partitions=8, master="local[4]", driver_memory="4g")
    spark = get_spark(cfg, app_name="engine-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()
