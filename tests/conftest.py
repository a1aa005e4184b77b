from __future__ import annotations

import pytest

from mistral_ocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mistral-ocr-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
