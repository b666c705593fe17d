from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
