"""Per-read serial-work and failure-reason survey on the chr21 bench set.

Runs every bench read through the resident kernel at the primary-tier
config, then re-runs the failures at the deep config, and prints the
n_work (pops + exact-completion chars) distribution plus the overflow
reason breakdown (bit 1 kx-interval, 2 acap, 4 path, 8 frame budget).
This is the data the tier/queue policy is calibrated from.

Run: python benchmarks/tail_survey.py [--n 8192] [--B 1024] [--kx 2]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    N = arg("--n", 8192)
    B = arg("--B", 1024)
    kx = arg("--kx", 2)
    cap = arg("--cap", 262144)

    import bench as benchmod
    from bwbble_tpu.align.params import AlnParams
    from bwbble_tpu.engine.device_index import from_fmindex
    from bwbble_tpu.engine.inexact import EngineConfig, inexact_search
    from bwbble_tpu.engine.pipeline import native_scan_chunks

    idx, reads, _ = benchmod.build_world()
    N = min(N, reads.count)
    didx = from_fmindex(idx)
    params = AlnParams(max_diff=4, batch_size=B)
    Lmax = reads.max_len
    idx.bit_planes()

    # exact native D bounds for all reads (chr21 worlds overflow the
    # device D pass wholesale)
    t0 = time.time()
    D_np = np.zeros((N, Lmax + 1, 2), dtype=np.int32)
    Ds_np = np.zeros((N, int(params.seed_length) + 1, 2), dtype=np.int32)
    from bwbble_tpu.formats.fastq import Reads
    sub = Reads(names=reads.names[:N], seq=reads.seq[:N], rc=reads.rc[:N],
                qual=reads.qual[:N], lengths=reads.lengths[:N])
    for gi, Dch, Dsch, _z in native_scan_chunks(idx, sub, params, 1024):
        D_np[gi[0]:gi[-1] + 1] = Dch
        Ds_np[gi[0]:gi[-1] + 1] = Dsch
    print(f"D scan: {time.time() - t0:.1f}s", flush=True)

    def run(sel, cfg, tier_B):
        nw = np.zeros(sel.size, np.int64)
        ov = np.zeros(sel.size, bool)
        why = np.zeros(sel.size, np.int64)
        secs = 0.0
        for s in range(0, sel.size, tier_B):
            part = sel[s:s + tier_B]
            padded = np.concatenate(
                [part, np.full(tier_B - part.size, part[0], part.dtype)])
            rc = np.zeros((tier_B, Lmax), np.int8)
            rc[:] = sub.rc[padded]
            ln = sub.lengths[padded].astype(np.int32)
            t0 = time.time()
            res = inexact_search(
                didx, jnp.asarray(rc), jnp.asarray(ln),
                jnp.asarray(D_np[padded]), jnp.asarray(Ds_np[padded]),
                params, cfg)
            got = {k: np.asarray(res[k]) for k in
                   ("n_work", "overflow", "ovwhy", "iters")}
            secs += time.time() - t0
            nw[s:s + part.size] = got["n_work"][:part.size]
            ov[s:s + part.size] = got["overflow"][:part.size]
            why[s:s + part.size] = got["ovwhy"][:part.size]
        return nw, ov, why, secs

    cfg1 = EngineConfig(cap=cap, acap=24, kx=kx, max_iters=500_000,
                        backend="resident")
    all_sel = np.arange(N, dtype=np.int64)
    nw1, ov1, why1, sec1 = run(all_sel, cfg1, B)
    q = lambda a, p: int(np.percentile(a, p)) if a.size else -1
    print(f"tier1 B={B} kx={kx} cap={cap}: {sec1:.1f}s "
          f"fail={ov1.sum()}/{N} ({100*ov1.mean():.1f}%)", flush=True)
    print(f"  n_work all: p50={q(nw1,50)} p90={q(nw1,90)} p99={q(nw1,99)} "
          f"max={nw1.max()} total={nw1.sum()}")
    for bit, name in ((1, "kx"), (2, "acap"), (4, "path"), (8, "frame")):
        print(f"  why {name}: {int(((why1 & bit) > 0).sum())}")

    fail = all_sel[ov1]
    if fail.size:
        cfg2 = EngineConfig(cap=2 << 20, acap=64, kx=16,
                            max_iters=500_000, backend="resident")
        nw2, ov2, why2, sec2 = run(fail, cfg2, 128)
        print(f"tier2 B=128 kx=16 cap=2M: {sec2:.1f}s on {fail.size} reads "
              f"fail={ov2.sum()} ({100*ov2.mean():.1f}%)", flush=True)
        print(f"  n_work tail: p50={q(nw2,50)} p90={q(nw2,90)} "
              f"p99={q(nw2,99)} max={nw2.max()} total={nw2.sum()}")
        for bit, name in ((1, "kx"), (2, "acap"), (4, "path"), (8, "frame")):
            print(f"  why {name}: {int(((why2 & bit) > 0).sum())}")


if __name__ == "__main__":
    main()
