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


def test_native_fastq_parser_matches_python(tmp_path):
    from bwbble_tpu.native import get_native
    nat = get_native()
    if nat is None or not getattr(nat, "_has_fastq", False):
        import pytest
        pytest.skip("native library not built")
    import numpy as np
    from bwbble_tpu.formats.fastq import parse_fastq_bytes
    from bwbble_tpu.testutil import random_genome_fasta, simulate_reads_fastq
    fa, fq = str(tmp_path / "g.fa"), str(tmp_path / "r.fq")
    random_genome_fasta(fa, {"c": 5000}, seed=5)
    simulate_reads_fastq(fa, fq, 30, read_len=73, num_mm=1, seed=6)
    data = open(fq, "rb").read()
    py = parse_fastq_bytes(data)
    seq, rc, lengths, name_off, name_len, qual_off = nat.parse_fastq(data)
    assert np.array_equal(seq, py.seq) and np.array_equal(rc, py.rc)
    assert np.array_equal(lengths, py.lengths)
    names = [data[o:o + l].decode() for o, l in zip(name_off, name_len)]
    assert names == py.names
    quals = [data[o:o + n] for o, n in zip(qual_off, lengths)]
    assert quals == py.qual
