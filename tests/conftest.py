from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from nipd_spark.session import get_spark
from nipd_spark.testing import make_duck

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nipd-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
