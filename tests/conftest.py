from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from autoaudit_spark.session import get_spark
from autoaudit_spark.registry import load_all

load_all()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
