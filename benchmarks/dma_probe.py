"""Probe: per-lane dynamic row DMA gather rate INSIDE a Pallas kernel.

The multi-pop kernel design (VERDICT r2 item 1) hinges on one number: how
fast a Pallas kernel can gather B0 independent 512-byte rows from an
HBM-resident table at per-lane dynamic indices, K times in a row with a
data dependency between waves (pop t+1's row index depends on pop t's
fetched data — the DFS chain).  XLA's gather engine does this at ~12
ns/row but only BETWEEN kernel launches (~100-175 us per launch at the
lane counts the chr21 tail allows); if in-kernel DMA waves cost <= a few
us each, the entire while_loop can move inside one pallas_call and the
per-pop overhead drops by 1-2 orders of magnitude.

Mosaic cannot load a scalar from VMEM at a dynamic lane offset, so the
per-lane indices live in SMEM; the vectorized next-index computation
writes to a (1, B0) VMEM row that is DMA'd to SMEM each wave (this
round-trip is part of what the probe measures).

Variants:
  wave      issue B0 row DMAs (one per lane), wait all, vector-compute
            next indices from the fetched rows (the dependency), repeat K
            times inside one kernel.
  compute   same + ~2 rank16-equivalents of VPU work per wave (does the
            issue cost hide under realistic per-pop compute?).

Run on the real chip: python benchmarks/dma_probe.py [B0] [K]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 913_021          # table rows (chr21-scale fat-row count)
W = 128              # row width in int32 words (512 B)


def _make(B0: int, K: int, heavy_compute: bool):
    def kernel(idx0_ref, tbl_ref, out_ref, rows, sem, idxv, idxs, sem2):
        idxv[:] = idx0_ref[:]                          # (8, B0) int32

        def sync_idx():
            cp = pltpu.make_async_copy(idxv, idxs, sem2)
            cp.start()
            cp.wait()

        sync_idx()

        def wave(t, carry):
            def issue(b, _):
                i = idxs[0, b]
                pltpu.make_async_copy(
                    tbl_ref.at[i], rows.at[b], sem.at[b]).start()
                return _
            jax.lax.fori_loop(0, B0, issue, 0)

            def wait(b, _):
                pltpu.make_async_copy(
                    tbl_ref.at[0], rows.at[b], sem.at[b]).wait()
                return _
            jax.lax.fori_loop(0, B0, wait, 0)

            if heavy_compute:
                xt = rows[:].T                         # [W, B0]
                acc = jnp.zeros((16, B0), jnp.int32)
                j16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
                for rep in range(2):
                    for w in range(4):
                        m = None
                        for tt in range(4):
                            word = xt[rep * 16 + 4 * tt + w:
                                      rep * 16 + 4 * tt + w + 1, :]
                            sel = jnp.where(((j16 >> tt) & 1) == 1,
                                            word, ~word)
                            m = sel if m is None else (m & sel)
                        acc = acc + jax.lax.population_count(m)
                s = jnp.sum(acc[:8], axis=0, dtype=jnp.int32)[None]
                idxv[0:1, :] = (idxv[0:1, :] + s) % N
            else:
                s = jnp.sum(rows[:, :8], axis=1, dtype=jnp.int32)
                idxv[0, :] = (idxv[0, :] + s) % N
            sync_idx()
            return carry

        jax.lax.fori_loop(0, K, wave, 0)
        out_ref[:] = idxv[:]

    @jax.jit
    def run(idx0, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, B0), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((B0, W), jnp.int32),
                pltpu.SemaphoreType.DMA((B0,)),
                pltpu.VMEM((8, B0), jnp.int32),
                pltpu.SMEM((8, B0), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx0, tbl)

    return run


def main():
    B0 = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    tbl = jnp.asarray(np.random.randint(0, 1 << 30, (N, W), np.int32))
    # DISTINCT warm/timed inputs: the axon stack dedups identical repeated
    # calls (reports ~0 ms) — see benchmarks/bench_kernel.py
    NB = 4
    idxs = [jnp.asarray(np.random.randint(0, N, (8, B0), np.int32))
            for _ in range(NB + 1)]

    for name, heavy in [("wave", False), ("compute", True)]:
        try:
            run = _make(B0, K, heavy)
            run(idxs[NB], tbl).block_until_ready()
            t0 = time.time()
            for r in range(NB):
                run(idxs[r], tbl).block_until_ready()
            dt = (time.time() - t0) / NB
            print(f"{name:8} B0={B0} K={K}: {dt*1e3:8.2f} ms total, "
                  f"{dt/K*1e6:7.2f} us/wave, {dt/(K*B0)*1e9:7.1f} ns/row")
        except Exception as e:
            print(f"{name:8} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
