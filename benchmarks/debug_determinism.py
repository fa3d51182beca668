"""Determinism probe: run the XLA queued body and the queued-resident
kernel TWICE each on identical inputs; report which side varies."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from bwbble_tpu import constants as C
from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.engine import device_index as DI
from bwbble_tpu.engine import kernel as PK
from bwbble_tpu.engine.inexact import EngineConfig, inexact_search_queued
from bwbble_tpu.engine.pipeline import _calc_d_chunk
from bwbble_tpu.formats.fastq import parse_fastq_bytes
from bwbble_tpu.index import FMIndex

rng = np.random.default_rng(177)
seq = rng.integers(1, 16, size=4000).astype(np.uint8)
acgt = np.array([15, 3, 7, 1], dtype=np.uint8)
seq[:3300] = acgt[rng.integers(0, 4, size=3300)]
seq[1600] = 0
seq = np.concatenate([seq, C.IUPAC_COMPL[seq[::-1]]])
idx = FMIndex.build(seq)
didx = DI.from_fmindex(idx)
reads = []
L = 32
chars = "AGCT"
for r in range(48):
    s = int(rng.integers(0, 3300 - L))
    frag = [chars[int(C.NT4_TABLE[C.IUPAC_CHAR[x]])]
            if C.IUPAC_CHAR[x] in b"ACGT" else "A" for x in seq[s:s + L]]
    for _ in range(int(rng.integers(0, 3))):
        frag[int(rng.integers(0, L))] = chars[int(rng.integers(0, 4))]
    if r % 11 == 5:
        p = int(rng.integers(2, L - 4))
        del frag[p]
        frag.append(chars[int(rng.integers(0, 4))])
    reads.append("".join(frag))
fq = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
             for i, s in enumerate(reads))
rd = parse_fastq_bytes(fq.encode())

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 8
params = AlnParams(max_diff=3, batch_size=128)
cfg = EngineConfig(cap=4096, acap=24, kx=4, max_iters=20_000,
                   flush=16, backend="xla")
rc = np.tile(np.asarray(rd.rc, dtype=np.int8), (TILE, 1))
lengths = np.tile(rd.lengths.astype(np.int32), TILE)
D, Ds, _ = _calc_d_chunk(didx, jnp.asarray(rc), jnp.asarray(lengths),
                         lengths, params, K=16)

KEYS = ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node", "o_mm",
        "o_snp", "o_plen", "overflow", "paths", "n_pushed")


def run(cfg_):
    res = inexact_search_queued(
        didx, jnp.asarray(rc), jnp.asarray(lengths), D, Ds,
        params, cfg_, lanes=128)
    return {k: np.asarray(v) for k, v in res.items()}


def cmp(a, b, name):
    bad = [k for k in KEYS if not np.array_equal(a[k], b[k])]
    print(f"{name}: {'EQUAL' if not bad else 'DIFF ' + ','.join(bad)}",
          flush=True)


x1 = run(cfg)
x2 = run(cfg)
cmp(x1, x2, "xla vs xla")
PK.INTERPRET = True
r1 = run(dataclasses.replace(cfg, backend="resident"))
r2 = run(dataclasses.replace(cfg, backend="resident"))
PK.INTERPRET = False
cmp(r1, r2, "res vs res")
cmp(x1, r1, "xla vs res1")
cmp(x1, r2, "xla vs res2")
