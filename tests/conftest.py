import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homonim_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="homonim-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def naive_box_sum(arr: np.ndarray, k):
    """Reference implementation: explicit zero-padded sliding sum."""
    kh, kw = k
    ph, pw = kh // 2, kw // 2
    h, w = arr.shape
    pad = np.zeros((h + kh, w + kw))
    pad[ph : ph + h, pw : pw + w] = arr
    out = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            out[i, j] = pad[i : i + kh, j : j + kw].sum()
    return out
