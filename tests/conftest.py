from __future__ import annotations

import os
import shutil

import pytest

from play_with_pulsar_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Managed test tables created via bucketBy().saveAsTable(). A run
# killed mid-write leaves their LOCATION on disk while the next
# session's fresh catalog has no table entry — DROP TABLE IF EXISTS
# is then a no-op and CREATE fails with LOCATION_ALREADY_EXISTS, so
# scrub stale locations at session start.
_TEST_TABLE_PREFIXES = ("pwp_test_", "li_bucketed", "o_bucketed", "ev_bucketed")


def _scrub_stale_test_tables() -> None:
    warehouse = os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pwp_warehouse")
    if not os.path.isdir(warehouse):
        return
    for entry in os.listdir(warehouse):
        if entry.startswith(_TEST_TABLE_PREFIXES):
            shutil.rmtree(os.path.join(warehouse, entry), ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    _scrub_stale_test_tables()
    s = get_spark(app_name="pwp-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECT
