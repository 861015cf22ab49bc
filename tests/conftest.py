import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from samba_spark.session import get_spark

    spark = get_spark(app_name="samba_tests", master="local[*]")
    yield spark


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT


@pytest.fixture()
def engine(spark, tmp_path):
    from samba_spark.session import ProvSession

    s = ProvSession(spark, name="test_run", prov_dir=str(tmp_path / "prov"))
    yield s
    s.stop()
