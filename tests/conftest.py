from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.sources.corpus import (  # noqa: E402
    generate_queries_pdf,
    generate_transcripts_pdf,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="tgist-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf():
    return generate_transcripts_pdf(n_convs=20, seed=42)


@pytest.fixture(scope="session")
def small_pdf():
    return generate_transcripts_pdf(n_convs=300, seed=42)


@pytest.fixture(scope="session")
def queries_pdf(small_pdf):
    return generate_queries_pdf(small_pdf, n_queries=400, seed=43)
