import numpy as np
import pytest

from kaza_lcms_spark import datagen
from kaza_lcms_spark.session import get_spark

N_IMAGES = 2000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kaza-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    return datagen.ensure_fixtures(N_IMAGES)


@pytest.fixture(scope="session")
def truth_lonlat():
    return datagen.footprint_from_ids(np.arange(N_IMAGES, dtype=np.int64))
