"""How should the search loop's rank-row gather be expressed?

Finding (v5e): a gather whose consumer FUSES (e.g. gather+reduce) runs at
memory bandwidth (~0.04 ns/row), so row fetches are cheap — the ~9 ns/row
cost of the loop's gather is the MATERIALIZATION of the [R,32] output
(and XLA picks a transposed layout for it).  This probe times the
materialization variants:

  fused      gather+reduce, never materialized (lower bound)
  mat        jnp.take materialized via optimization_barrier
  mat_T      lax.gather producing [R//B, 32, B] (kernel layout) directly
  mat_xpose  jnp.take + explicit transpose to [R//B, 32, B], materialized

Run: python benchmarks/gather_split_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    N = 913_021          # chr21-scale block count
    B = 1024
    RQ = 6               # streams at kx=2
    R = RQ * B
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, 32), np.int32))
    idx = jnp.asarray(np.random.randint(0, N, (R,), np.int32))

    def fused(t, ix):
        return jnp.take(t, ix, axis=0).sum(dtype=jnp.int32)

    def mat(t, ix):
        rows = lax.optimization_barrier(jnp.take(t, ix, axis=0))
        return rows.sum(dtype=jnp.int32)

    def mat_T(t, ix):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        g = lax.gather(t, ix.reshape(RQ, B, 1), dn, slice_sizes=(1, 32))
        # output [RQ, 32, B]: operand dim1 lands at output dim 1, index
        # batch dims (RQ, B) at dims (0, 2) — the kernel's lane-major rows
        rows = lax.optimization_barrier(g)
        return rows.sum(dtype=jnp.int32)

    def mat_xpose(t, ix):
        rows = jnp.take(t, ix, axis=0)
        rt = rows.reshape(RQ, B, 32).transpose(0, 2, 1)
        return lax.optimization_barrier(rt).sum(dtype=jnp.int32)

    def loop(t, ix, f, iters=200):
        def body(i, acc):
            return acc + f(t, (ix + i) % N)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    for name, f in (("fused", fused), ("mat", mat), ("mat_T", mat_T),
                    ("mat_xpose", mat_xpose)):
        g = jax.jit(lambda t, ix, f=f: loop(t, ix, f))
        g(table, idx).block_until_ready()
        t0 = time.time()
        g(table, idx).block_until_ready()
        dt = (time.time() - t0) / 200
        print(f"{name:10}: {dt*1e6:7.1f} us/iter ({dt/R*1e9:5.2f} ns/row)")


def dependent():
    """Strictly serialize gathers through the dependence chain (like the
    real search loop, whose next indices come from this iteration's
    kernel output): cost = exposed per-gather latency."""
    import numpy as np
    N = 913_021
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, 32), np.int32))
    for R in (1024, 2048, 6144, 10240):
        idx = jnp.asarray(np.random.randint(0, N, (R,), np.int32))

        def f(t, ix):
            rows = jnp.take(t, ix, axis=0)
            s = rows.sum(axis=1, dtype=jnp.int32)      # [R]
            return (ix + s) % N                        # next depends on rows

        def loop(t, ix, iters=200):
            return lax.fori_loop(0, iters, lambda i, x: f(t, x), ix)

        g = jax.jit(loop)
        g(table, idx).block_until_ready()
        t0 = time.time()
        g(table, idx).block_until_ready()
        dt = (time.time() - t0) / 200
        print(f"dependent R={R:6}: {dt*1e6:7.1f} us/iter "
              f"({dt/R*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    if "--dep" in sys.argv:
        dependent()
    else:
        main()
