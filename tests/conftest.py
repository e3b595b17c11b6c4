from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
GOLDEN_INPUT = os.path.join(GOLDEN_DIR, "t1_input.parquet")
GOLDEN_OUTPUT = os.path.join(GOLDEN_DIR, "t1_expected.parquet")


@pytest.fixture(scope="session")
def spark():
    from extractor.job import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false"})
    yield s
    s.stop()
