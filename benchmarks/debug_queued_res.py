"""Repro: queued-resident vs XLA queue divergence on the aligning world."""
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
from bwbble_tpu.engine.inexact import (EngineConfig, inexact_search_queued)
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


def run(cfg_):
    res = inexact_search_queued(
        didx, jnp.asarray(rc), jnp.asarray(lengths), D, Ds,
        params, cfg_, lanes=128)
    return {k: np.asarray(v) for k, v in res.items()}


ref = run(cfg)
PK.INTERPRET = True
got = run(dataclasses.replace(cfg, backend="resident"))
PK.INTERPRET = False

bad = []
allrows = set()
for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
          "o_mm", "o_snp", "o_plen", "overflow", "paths", "n_pushed"):
    eq = ref[k] == got[k]
    if not np.all(eq):
        rows = np.unique(np.argwhere(~eq)[:, 0])
        bad.append((k, rows))
        allrows.update(int(r) for r in rows)
print("NR =", rc.shape[0])
if not bad:
    print("ALL EQUAL")
for k, rows in bad:
    print(f"{k}: mismatch rows {rows[:20]}")
for r in sorted(allrows)[:12]:
    print(f"read {r}: ref lane={ref['o_lane'][r]} n={ref['n_alns'][r]} "
          f"L0={ref['o_L'][r, 0]} U0={ref['o_U'][r, 0]} "
          f"node0={ref['o_node'][r, 0]} score0={ref['o_score'][r, 0]}")
    print(f"         got lane={got['o_lane'][r]} n={got['n_alns'][r]} "
          f"L0={got['o_L'][r, 0]} U0={got['o_U'][r, 0]} "
          f"node0={got['o_node'][r, 0]} score0={got['o_score'][r, 0]}")
