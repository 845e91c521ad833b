import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pyspark 4's structured error logger binds a StreamHandler to whatever
# sys.stderr was when the FIRST exception logged — under pytest that is
# one test's capsys stream, closed by the time a later test triggers a
# log record, and logging then prints a "--- Logging error ---"
# traceback INTO the later test's captured stderr (order-dependent:
# surfaced when test_privacy_ledger ran before test_expectations'
# no-traceback assertion). Emission failures in a fully-captured suite
# are noise, not signal — drop them instead of re-printing.
logging.raiseExceptions = False

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from database_anonymiser_minimiser_spark.session import get_spark

    spark = get_spark(app_name="dbmask-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
