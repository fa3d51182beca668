"""Per-iteration cost of the Pallas loop-body kernel vs the XLA body on
the real TPU.

Run: python benchmarks/bench_kernel.py [B] [cap] [iters] [--chr21]
Loads the cached easy (or chr21) bench world, dispatches one capped
inexact_search per backend at the given lane count, and reports
us/iteration and ns/lane-iteration for each.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if len(args) > 0 else 256
    cap = int(args[1]) if len(args) > 1 else 131072
    iters_cap = int(args[2]) if len(args) > 2 else 2000
    chr21 = "--chr21" in sys.argv

    import bench as benchmod
    from bwbble_tpu.align.params import AlnParams
    from bwbble_tpu.engine.device_index import from_fmindex
    from bwbble_tpu.engine.inexact import EngineConfig, inexact_search
    from bwbble_tpu.engine.pipeline import _calc_d_chunk

    if chr21:
        idx, reads, _ = benchmod.build_world()
    else:
        idx, reads, _ = benchmod.build_world_easy()
    didx = from_fmindex(idx)
    params = AlnParams(max_diff=4, batch_size=B)

    # DISTINCT input batches: the axon stack dedups identical repeated
    # calls (reports ~0 ms), so warm timing must use fresh inputs
    NBATCH = 4
    Lmax = reads.max_len
    batches = []
    t0 = time.time()
    for part in range(NBATCH):
        rc = np.zeros((B, Lmax), dtype=np.int8)
        rc[:] = reads.rc[part * B:(part + 1) * B]
        lengths = reads.lengths[part * B:(part + 1) * B].astype(np.int32)
        D, Ds, _ov = _calc_d_chunk(didx, jnp.asarray(rc),
                                   jnp.asarray(lengths), lengths, params,
                                   K=64 if chr21 else 16)
        jax.block_until_ready(D)
        batches.append((jnp.asarray(rc), jnp.asarray(lengths), D, Ds))
    print(f"world={'chr21' if chr21 else 'easy'} B={B} cap={cap} "
          f"dbounds={time.time() - t0:.1f}s")

    kx = int(sys.argv[sys.argv.index("--kx") + 1]) if "--kx" in sys.argv else 4
    xcap = int(sys.argv[sys.argv.index("--xcap") + 1]) if "--xcap" in sys.argv else 0
    backends = ("xla", "pallas", "resident")
    if "--resident" in sys.argv:
        backends = ("resident",)
    elif "--pallas" in sys.argv:
        backends = ("pallas",)
    for backend in backends:
        cfg = EngineConfig(cap=cap, acap=24, kx=kx, xcap=xcap, max_iters=iters_cap,
                           backend=backend)
        rc0, ln0, D0, Ds0 = batches[0]
        t0 = time.time()
        res = inexact_search(didx, rc0, ln0, D0, Ds0, params, cfg)
        np.asarray(res["n_alns"])
        t_compile = time.time() - t0
        per = []
        for rc1, ln1, D1, Ds1 in batches[1:]:
            t0 = time.time()
            res = inexact_search(didx, rc1, ln1, D1, Ds1, params, cfg)
            np.asarray(res["n_alns"])
            dt = time.time() - t0
            iters = int(np.asarray(res["iters"]))
            per.append(dt / max(iters, 1))
        n_al = int(np.sum(np.asarray(res["n_alns"]) > 0))
        n_ov = int(np.sum(np.asarray(res["overflow"])))
        med = sorted(per)[len(per) // 2]
        print(f"{backend:7s} compile+run={t_compile:7.1f}s "
              f"per-iter=[{', '.join(f'{p * 1e6:.1f}' for p in per)}] us "
              f"median {med * 1e6:.1f} us/iter "
              f"{med / B * 1e9:.1f} ns/lane-iter "
              f"(aligned={n_al} overflow={n_ov})")


if __name__ == "__main__":
    main()
