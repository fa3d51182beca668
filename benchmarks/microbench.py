"""TPU microbenchmarks behind the engine's design decisions.

Run on a real chip: `python benchmarks/microbench.py`.  Prints the measured
cost model (see STATUS.md and the commit log for the decisions these drove):

1. row gathers from the fused rank table (jnp.take) — latency-bound,
   ~25-30 ns/row regardless of row width;
2. a Pallas VMEM-resident scalar-loop row gather — measured SLOWER than
   XLA's native gather (serial dynamic slices don't beat the hardware
   gather path), which is why the engine keeps the XLA formulation;
3. the full 16-symbol rank pair (gather + XNOR-AND popcounts);
4. expand_step (rank + one-hot candidate selection + scatter-free merge).

Timing note: identical repeated inputs report ~0 ms through the axon stack;
every trial below uses fresh index vectors.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(label, fn, args_list, n=12):
    fn(*args_list[0]).block_until_ready() if hasattr(
        fn(*args_list[0]), "block_until_ready") else jax.block_until_ready(
        fn(*args_list[0]))
    t0 = time.time()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(n)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt * 1e3:.3f} ms")
    return dt


def main():
    from bwbble_tpu.index.fmindex import FMIndex
    from bwbble_tpu.engine.device_index import from_fmindex
    from bwbble_tpu.engine.rank import rank_all_exact_pair
    from bwbble_tpu.engine.intervals import expand_step

    rng = np.random.default_rng(0)
    import os
    bwt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench", "bench.bwt")
    idx = FMIndex.load(bwt)
    didx = from_fmindex(idx)
    NB = didx.table.shape[0]
    L = int(idx.length)
    N = 65536

    ks = [jnp.asarray(rng.integers(0, NB, N).astype(np.int32))
          for _ in range(5)]
    take = jax.jit(lambda k: jnp.take(didx.table, k, axis=0))
    dt = bench(f"jnp.take {N} x 128B rows", take, [(k,) for k in ks])
    print(f"  -> {dt / N * 1e9:.1f} ns/row")

    pos = [(jnp.asarray(rng.integers(-1, L - 1, N // 2).astype(np.int32)),
            jnp.asarray(rng.integers(0, L - 1, N // 2).astype(np.int32)))
           for _ in range(5)]
    rank = jax.jit(lambda a, b: rank_all_exact_pair(didx, a, b))
    bench(f"rank_all_exact_pair {N} queries", rank, pos)

    B, K = 8192, 2
    def mk():
        Ls = rng.integers(0, L - 2, (B, K)).astype(np.int32)
        return (jnp.asarray(Ls), jnp.asarray(Ls + 1),
                jnp.asarray(rng.integers(0, 3, B).astype(np.int32)),
                jnp.asarray(rng.integers(0, 4, B).astype(np.int32)))
    es = jax.jit(lambda a, b, c, d: expand_step(didx, a, b, c, d))
    bench(f"expand_step [B={B}, K={K}]", es, [mk() for _ in range(5)])


if __name__ == "__main__":
    main()
