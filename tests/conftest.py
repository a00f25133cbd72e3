from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from autoaudit_spark.session import get_spark
from autoaudit_spark.registry import load_all

load_all()

#: all fixture paths derive from one overridable root so the suite runs
#: (or skips cleanly) on machines that keep the testdata elsewhere
SF_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = f"{SF_ROOT}/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_root():
    return SF_ROOT
