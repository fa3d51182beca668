"""Native C++ runtime: SA-IS vs the numpy fallback, occ builder parity."""

import numpy as np
import pytest

from bwbble_tpu.index.suffix_array import _suffix_array_doubling
from bwbble_tpu.native import get_native


@pytest.fixture(scope="module")
def nat():
    n = get_native()
    if n is None:
        pytest.skip("native library not built")
    return n


def test_sais_matches_doubling(nat):
    rng = np.random.default_rng(0)
    for n in [1, 2, 5, 33, 1000, 20_000]:
        seq = rng.integers(0, 16, size=n).astype(np.uint8)
        assert np.array_equal(nat.suffix_array(seq),
                              _suffix_array_doubling(seq)), n


def test_sais_degenerate(nat):
    assert np.array_equal(nat.suffix_array(np.zeros(500, dtype=np.uint8)),
                          np.arange(499, -1, -1))
    ab = np.tile(np.array([1, 2], dtype=np.uint8), 300)
    assert np.array_equal(nat.suffix_array(ab), _suffix_array_doubling(ab))


def test_build_occ(nat):
    rng = np.random.default_rng(1)
    bwt = rng.integers(0, 16, size=10_000).astype(np.uint8)
    sa0 = 777
    bwt[sa0] = 0
    occ = nat.build_occ(bwt, sa0, 128)
    for k in range(occ.shape[0]):
        ck = k * 128
        for c in (0, 1, 15):
            want = int(np.count_nonzero(bwt[:ck + 1] == c))
            if c == 0 and sa0 <= ck:
                want -= 1
            assert occ[k, c] == want
