from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pentaho_kettle_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pks-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_df_equals_pandas(spark_df, pdf, sort_cols):
    """Bit-for-bit comparison of a Spark result vs a pandas oracle."""
    import pandas as pd

    got = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    want = pdf.sort_values(sort_cols).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        if str(want[c].dtype).startswith("datetime64"):
            got[c] = got[c].astype("datetime64[us]")
            want[c] = want[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
