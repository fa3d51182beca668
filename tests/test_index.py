"""FM-index query-model tests: ranks vs brute force, reference quirks,
SA resolution, suffix-array construction."""

import numpy as np
import pytest

from bwbble_tpu import constants as C
from bwbble_tpu.index import FMIndex
from bwbble_tpu.index.suffix_array import _suffix_array_doubling, suffix_array


def brute_rank(idx, c, i):
    """#occurrences of c in bwt[0..i], excluding the sa0 sentinel row."""
    if i < 0:
        return 0
    cnt = int(np.count_nonzero(idx.bwt[: i + 1] == c))
    if c == 0 and idx.sa0 <= i:
        cnt -= 1
    return cnt


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(11)
    # genome with '$' separators and IUPAC codes sprinkled in
    seq = rng.integers(1, 16, size=5000).astype(np.uint8)
    seq[1000] = 0
    seq[3000] = 0
    return FMIndex.build(seq)


def test_suffix_array_small():
    seq = np.frombuffer(b"\x01\x03\x01\x03\x01", dtype=np.uint8)
    sa = _suffix_array_doubling(seq)
    suffixes = [bytes(seq[i:]) for i in range(5)]
    expect = sorted(range(5), key=lambda i: suffixes[i])
    assert sa.tolist() == expect


def test_suffix_array_random():
    rng = np.random.default_rng(5)
    seq = rng.integers(0, 4, size=800).astype(np.uint8)
    sa = suffix_array(seq)
    suffixes = sorted(range(800), key=lambda i: bytes(seq[i:]))
    assert sa.tolist() == suffixes


def test_O_matches_brute_force(idx):
    rng = np.random.default_rng(2)
    positions = list(rng.integers(0, idx.length - 1, size=120)) + [
        -1, 0, 1, 127, 128, 129, idx.length - 2, idx.length - 1, idx.sa0]
    for i in positions:
        for c in range(16):
            got = idx.O(c, int(i))
            if i == idx.length - 1:
                want = int(idx.Carr[c + 1] - idx.Carr[c])
            else:
                want = brute_rank(idx, c, int(i))
            assert got == want, (c, i, got, want)


def test_O_alphabet_quirk(idx):
    """The bulk scan returns C[j]+inc for B/H/V/D (minus the first-char
    leak), and exact bounds for everything else (quirk Q1)."""
    rng = np.random.default_rng(3)
    for i in rng.integers(0, idx.length - 2, size=60):
        i = int(i)
        for inc in (0, 1):
            occ = idx.O_alphabet(i, inc)
            k = i // C.OCC_INTERVAL
            first = int(idx.bwt[k * C.OCC_INTERVAL])
            for j in range(1, 16):
                if j in C.SKIPPED_ORDERS:
                    want = int(idx.Carr[j]) + inc - (1 if first == j else 0)
                else:
                    want = int(idx.Carr[j]) + brute_rank(idx, j, i) + inc
                assert occ[j] == want, (i, j, occ[j], want)


def test_O_alphabet_edges(idx):
    occ = idx.O_alphabet(-1, 1)
    for j in range(1, 16):
        assert occ[j] == idx.Carr[j] + 1
    occ = idx.O_alphabet(idx.length - 1, 0)
    for j in range(1, 16):
        # edge path includes the skipped codes (full counts)
        assert occ[j] == idx.Carr[j + 1]


def test_O_actg_alphabet(idx):
    rng = np.random.default_rng(4)
    gray = [15, 3, 7, 1]  # A,G,C,T
    for i in list(rng.integers(0, idx.length - 2, size=40)) + [-1, idx.length - 1]:
        i = int(i)
        occ = idx.O_actg_alphabet(i, 0)
        for s, g in enumerate(gray):
            if i == idx.length - 1:
                want = int(idx.Carr[g + 1])
            elif i < 0:
                want = int(idx.Carr[g])
            else:
                want = int(idx.Carr[g]) + brute_rank(idx, g, i)
            assert occ[s + 1] == want


def test_SA_inverse(idx):
    # SA(i) over all rows must be a permutation reproducing sorted suffixes
    vals = [idx.SA(i) for i in range(0, idx.length, 97)]
    # spot-check against a directly built full SA
    seq = None
    # reconstruct the text via LF-walk is overkill; instead rebuild
    rng = np.random.default_rng(11)
    seq = rng.integers(1, 16, size=5000).astype(np.uint8)
    seq[1000] = 0
    seq[3000] = 0
    full = suffix_array(seq)
    full = np.concatenate([[5000], full])
    for row, v in zip(range(0, idx.length, 97), vals):
        assert v == full[row]


def test_esa_ingest_roundtrip(tmp_path):
    from bwbble_tpu.index.suffix_array import read_esa_40bit
    rng = np.random.default_rng(8)
    seq = rng.integers(1, 16, size=2000).astype(np.uint8)
    full = np.concatenate([[2000], suffix_array(seq)])
    # write 40-bit little-endian entries for suffixes 1..n
    body = full[1:]
    raw = np.zeros((2000, 5), dtype=np.uint8)
    for b in range(5):
        raw[:, b] = (body >> (8 * b)) & 0xFF
    p = tmp_path / "esa.bin"
    raw.tofile(p)
    got = read_esa_40bit(str(p), 2000)
    assert np.array_equal(got, full)
    idx1 = FMIndex.build(seq)
    idx2 = FMIndex.build(seq, full_sa=got)
    assert np.array_equal(idx1.bwt, idx2.bwt)
    assert np.array_equal(idx1.occ, idx2.occ)
    assert np.array_equal(idx1.sa, idx2.sa)
    assert idx1.sa0 == idx2.sa0
