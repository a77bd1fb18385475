import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgpipe.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgpipe-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_set(spark):
    from kgpipe import fixtures

    fx = fixtures.full_fixture_set(spark, n_convs=40, n_entities=80)
    fx["transcripts"] = fx["transcripts"].cache()
    fx["transcripts"].count()
    return fx
