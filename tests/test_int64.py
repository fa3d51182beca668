"""64-bit index arithmetic (whole-genome scale; reference bwtint_t = uint64,
common.h:6).

JAX x64 must be enabled before JAX initializes, so the real checks run in a
subprocess with JAX_ENABLE_X64=1.  Covered:
- rank bounds on a fabricated index whose checkpoint counts exceed 2^31
  (the arithmetic surface that an int32 engine silently overflows), checked
  against a numpy int64 model of the same formula;
- end-to-end parity: the full device pipeline on an int64 DeviceIndex
  byte-matches the host gold engine (and therefore the int32 path);
- from_fmindex validation behavior.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from bwbble_tpu import constants as C
from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.align.pipeline import align_reads_gold
from bwbble_tpu.engine import device_index as DI
from bwbble_tpu.engine import rank as R
from bwbble_tpu.engine.inexact import EngineConfig
from bwbble_tpu.engine.pipeline import align_reads_device
from bwbble_tpu.formats.fastq import parse_fastq_bytes
from bwbble_tpu.index import FMIndex

# ---- 1. rank arithmetic above 2^31: fabricate a device index whose
# checkpoint counts/C values are huge (a "virtual offset" index: the local
# in-block structure is real, all cumulative counts are shifted by OFF)
rng = np.random.default_rng(3)
OFF = np.int64(3) << 32            # ~1.3e10, far beyond int32
NBLK = 64
blocks = rng.integers(0, 16, size=(NBLK, 128)).astype(np.int8)
planes = DI.build_planes(blocks)
occ = rng.integers(0, 100, size=(NBLK, 16)).astype(np.int64) + OFF
table = np.concatenate(
    [planes,
     (occ & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
     (occ >> 32).astype(np.int32)], axis=1)
Carr = (np.arange(17, dtype=np.int64) * 7 + OFF)
length = np.int64(NBLK) * 128 + OFF
didx = DI.DeviceIndex(
    table=jnp.asarray(table), Carr=jnp.asarray(Carr),
    sa_samples=jnp.asarray(np.zeros(4, dtype=np.int64)),
    length=jnp.asarray(length), sa0=jnp.asarray(np.int64(1)))
assert didx.idt == jnp.int64

pos = rng.integers(0, NBLK * 128 - 2, size=128).astype(np.int64)
got = np.asarray(R.rank_all_exact(didx, jnp.asarray(pos), 0))
# numpy model: Carr[j] + occ[blk, j] + (# codes == j at positions
# blk*128..off) - (block first char == j)
for t in range(pos.size):
    p = int(pos[t]); k = p // 128; o = p % 128
    for j in range(16):
        cnt = int(np.sum(blocks[k, :o + 1] == j))
        exp = int(Carr[j]) + int(occ[k, j]) + cnt - (1 if blocks[k, 0] == j
                                                     else 0)
        if j == 0:
            exp = 0   # slot 0 cleared by the kernel
        assert got[t, j] == exp, (t, j, got[t, j], exp)
print("rank>2^31 OK")

# ---- 2. e2e parity on an int64 index vs the gold engine
seq = rng.integers(1, 16, size=4000).astype(np.uint8)
acgt = np.array([15, 3, 7, 1], dtype=np.uint8)
seq[:3400] = acgt[rng.integers(0, 4, size=3400)]
idx = FMIndex.build(seq)
didx64 = DI.from_fmindex(idx, use_int64=True)
assert didx64.idt == jnp.int64

chars = "AGCT"
reads, names = [], []
L = 32
for r in range(20):
    s = int(rng.integers(0, 3000))
    frag = [chars[int(C.NT4_TABLE[C.IUPAC_CHAR[x]])]
            if C.IUPAC_CHAR[x] in b"ACGT" else "A" for x in seq[s:s + L]]
    for _ in range(int(rng.integers(0, 3))):
        frag[int(rng.integers(0, L))] = chars[int(rng.integers(0, 4))]
    reads.append("".join(frag)); names.append(f"r{r}")
fq = "".join(f"@{n}\n{s}\n+\n{'I' * L}\n" for n, s in zip(names, reads))
rd = parse_fastq_bytes(fq.encode())

params = AlnParams(max_diff=3, batch_size=64)
cfg = EngineConfig(cap=8192, acap=32, kx=8)
dev = align_reads_device(idx, didx64, rd, params, cfg, d_cap=16,
                         sort_reads=False)
gold = align_reads_gold(idx, rd, params)
assert len(dev) == len(gold)
for a, b in zip(dev, gold):
    assert a == b, (a, b)
print("e2e int64 parity OK")

# ---- 3. queued mode rejects int64 cleanly
from bwbble_tpu.engine.inexact import inexact_search_queued
try:
    import jax.numpy as jnp2
    inexact_search_queued(didx64, jnp2.zeros((8, L), jnp2.int32),
                          jnp2.full((8,), L, jnp2.int32),
                          jnp2.zeros((8, L + 1, 2), jnp2.int64),
                          jnp2.zeros((8, 33, 2), jnp2.int64),
                          params, cfg, lanes=8)
    raise SystemExit("expected NotImplementedError")
except NotImplementedError:
    print("queued int64 rejected OK")
"""


def test_int64_engine_subprocess():
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "rank>2^31 OK" in r.stdout
    assert "e2e int64 parity OK" in r.stdout
    assert "queued int64 rejected OK" in r.stdout


def test_from_fmindex_validation():
    """int64 without x64 mode is a clear error (not silent truncation)."""
    from bwbble_tpu.engine.device_index import from_fmindex
    from bwbble_tpu.index import FMIndex
    rng = np.random.default_rng(0)
    idx = FMIndex.build(rng.integers(1, 16, size=600).astype(np.uint8))
    with pytest.raises(ValueError, match="x64"):
        from_fmindex(idx, use_int64=True)
