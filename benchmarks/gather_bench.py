"""Head-to-head benchmark of row-gather strategies for the rank table.

The whole aligner reduces to: fetch [N] random 128-byte rows of the fused
rank table (planes+checkpoints) per step.  XLA's native gather measured
26-77 ns/row in round 1 — this decides whether a Pallas formulation beats
it, and therefore the round-2 kernel strategy.

Variants:
  take        — jnp.take (XLA gather), the round-1 engine path
  vmem        — Pallas: table resident in VMEM, scalar-prefetched indices,
                fori_loop of dynamic row loads (table must fit in ~12 MB)
  vmem_u8     — same with 8x unrolled loop
  hbm_dma     — Pallas: table in HBM, ring of NBUF in-flight per-row DMAs
  onehot_seg  — two-level one-hot matmul within 1024-row segments (MXU)

Run: python benchmarks/gather_bench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, args_list, n=10):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(n)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n
    return dt


# ------------------------------------------------------------------ pallas

def _vmem_kernel(idx_ref, table_ref, out_ref, *, n, unroll):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, n, body, 0, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("unroll",))
def gather_vmem(table, idx, unroll=1):
    n = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_vmem_kernel, n=n, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((n, table.shape[1]), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(idx, table)


def _hbm_kernel(idx_ref, table_ref, out_ref, scratch, sems, *, n, nbuf):
    def start(i):
        slot = jax.lax.rem(i, nbuf)
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i], 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).start()

    def wait_and_emit(i):
        slot = jax.lax.rem(i, nbuf)
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i], 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).wait()
        out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

    for i in range(nbuf):
        start(i)

    def body(i, _):
        wait_and_emit(i)

        @pl.when(i + nbuf < n)
        def _():
            start(i + nbuf)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("nbuf",))
def gather_hbm(table, idx, nbuf=16):
    n = idx.shape[0]
    w = table.shape[1]
    return pl.pallas_call(
        functools.partial(_hbm_kernel, n=n, nbuf=nbuf),
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, w), table.dtype),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        ),
    )(idx, table)


# --------------------------------------------------------------------- main

def main():
    rng = np.random.default_rng(0)
    for NBLK in (78_125,):          # bench genome: 10 Mbp fwd+rc / 128
        table = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                         (NBLK, 32)).astype(np.int32))
        for N in (16_384, 65_536):
            ks = [jnp.asarray(rng.integers(0, NBLK, N).astype(np.int32))
                  for _ in range(5)]
            args = [(k,) for k in ks]
            print(f"-- table [{NBLK}, 32] int32 "
                  f"({NBLK * 128 / 1e6:.0f} MB), N={N}")

            take = jax.jit(lambda k: jnp.take(table, k, axis=0))
            dt = timeit("take", take, args)
            print(f"take      : {dt * 1e3:8.3f} ms  {dt / N * 1e9:7.1f} ns/row")
            ref = np.asarray(take(ks[0]))

            for unroll in (1, 8):
                try:
                    f = jax.jit(lambda k, u=unroll: gather_vmem(table, k, u))
                    out = np.asarray(f(ks[0]))
                    ok = "OK" if np.array_equal(out, ref) else "WRONG"
                    dt = timeit("vmem", f, args)
                    print(f"vmem u{unroll:<2}  : {dt * 1e3:8.3f} ms  "
                          f"{dt / N * 1e9:7.1f} ns/row  [{ok}]")
                except Exception as e:
                    print(f"vmem u{unroll}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}")

            for nbuf in (8, 32):
                try:
                    f = jax.jit(lambda k, b=nbuf: gather_hbm(table, k, b))
                    out = np.asarray(f(ks[0]))
                    ok = "OK" if np.array_equal(out, ref) else "WRONG"
                    dt = timeit("hbm", f, args)
                    print(f"hbm b{nbuf:<3}  : {dt * 1e3:8.3f} ms  "
                          f"{dt / N * 1e9:7.1f} ns/row  [{ok}]")
                except Exception as e:
                    print(f"hbm b{nbuf}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
