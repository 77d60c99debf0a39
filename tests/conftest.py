from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from elt_gluepipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4",
                              "spark.ui.enabled": "false"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_operator_caches():
    """Operator-internal persists (prefix join, triangles, tolerant
    CSV) are registry-tracked; dropping them after every test keeps
    the shared session's storage memory flat across the suite."""
    yield
    from elt_gluepipeline_spark.operators._cache import (
        release_operator_caches)
    release_operator_caches()
