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


#: repo-root sf1 fixture dir — derived (240 MB), correctly not committed
_SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling_sf1"
)


def pytest_configure(config):
    """Auto-build the sf1 fixture when asked (SPARK_GRAFT_SYNTH_SF1=1):
    a fresh clone can opt into the 10-test sf1 streaming scale gate
    without a manual step."""
    if os.environ.get("SPARK_GRAFT_SYNTH_SF1") and not os.path.isdir(_SF1_DIR):
        import subprocess

        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "scaling_sf1.py",
        )
        subprocess.run([sys.executable, script, "--synth-only"], check=True)


def pytest_collection_modifyitems(config, items):
    """Apply the slow-tier marker (r18, VERDICT r17 task #2): node ids
    listed in tests/_slow_tier.py get @pytest.mark.slow at collection,
    and pytest.ini deselects `-m "not slow"` by default so the driver's
    suite run finishes inside its timeout. No test is deleted; the soak
    tier runs with `-m slow` (or `-m "slow or not slow"` for all)."""
    from tests._slow_tier import SLOW_TIER

    for item in items:
        # nodeid is tests/<file>::<test>[param]; the list stores it
        # without the tests/ prefix
        nid = item.nodeid
        if nid.startswith("tests/"):
            nid = nid[len("tests/") :]
        if nid in SLOW_TIER:
            item.add_marker(pytest.mark.slow)


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make the sf1 scale gate's absence LOUD (VERDICT r11 #3): without
    this, a fresh clone reports ~10 fewer passes with no visible signal
    that a scale-correctness gate silently skipped."""
    if not os.path.isdir(_SF1_DIR):
        terminalreporter.write_sep("=", "SF1 SCALE GATE SKIPPED", yellow=True, bold=True)
        terminalreporter.write_line(
            "tests/test_streaming_sf1.py (10 tests) was SKIPPED: the derived"
        )
        terminalreporter.write_line(
            f"sf1 fixture {_SF1_DIR} is absent. Build it (~240 MB) with:"
        )
        terminalreporter.write_line(
            "  python scripts/scaling_sf1.py --synth-only"
        )
        terminalreporter.write_line(
            "or run pytest with SPARK_GRAFT_SYNTH_SF1=1 to auto-build it."
        )
