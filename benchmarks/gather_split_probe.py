"""Does XLA overlap independent row gathers on TPU?

The search loop is bound by ONE big row gather (~9 ns/row regardless of
row size or layout).  If independent gathers execute concurrently, the
loop can split its rank-row gather per stream; if they serialize, the
only lever is fewer streams.

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


def main():
    N = 913_021          # chr21-scale block count
    R = 10_240           # rows per iteration at B=1024, kx=4
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, 32), np.int32))
    idx = jnp.asarray(np.random.randint(0, N, (R,), np.int32))

    @jax.jit
    def one(t, ix):
        return jnp.take(t, ix, axis=0).sum(dtype=jnp.int32)

    @jax.jit
    def split4(t, ix):
        parts = [jnp.take(t, ix[i::4], axis=0).sum(dtype=jnp.int32)
                 for i in range(4)]
        return sum(parts)

    @jax.jit
    def loop(t, ix, f, iters=200):
        def body(i, acc):
            return acc + f(t, (ix + i) % N)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    for name, f in (("one", one), ("split4", split4)):
        g = jax.jit(lambda t, ix, f=f: loop(t, ix, f))
        g(table, idx).block_until_ready()
        t0 = time.time()
        g(table, idx).block_until_ready()
        dt = (time.time() - t0) / 200
        print(f"{name}: {dt*1e6:.1f} us/iter ({dt/R*1e9:.2f} ns/row)")


if __name__ == "__main__":
    main()
