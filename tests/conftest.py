"""Shared fixtures: one local SparkSession, cached synthetic corpora."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark import fixtures as fx  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402
from crawler_spark.urltools import registrable_domain  # noqa: E402

FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures"
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler-spark-tests")
    yield s


@pytest.fixture(scope="session")
def smoke_dir() -> str:
    return fx.ensure_corpus(fx.SMOKE, FIXTURE_ROOT, registrable_domain)


@pytest.fixture(scope="session")
def smoke_corpus():
    return fx.build_corpus(fx.SMOKE, registrable_domain)
