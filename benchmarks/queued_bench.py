"""Chr21 bench workload through the ring-queue resident engine.

Measures end-to-end align time + fallback for continuous batching
(queued=True, backend=resident) against the fixed difficulty-sorted
tiers the bench currently uses, on the SAME cached world + 8,192 reads.

Run: python benchmarks/queued_bench.py [lanes] [cap] [qchunk] [--fixed]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lanes = int(args[0]) if len(args) > 0 else 1024
    cap = int(args[1]) if len(args) > 1 else 327680
    qchunk = int(args[2]) if len(args) > 2 else 2
    fixed = "--fixed" in sys.argv

    import bench as benchmod
    from bwbble_tpu.align.params import AlnParams
    from bwbble_tpu.engine.device_index import from_fmindex
    from bwbble_tpu.engine.inexact import EngineConfig
    from bwbble_tpu.engine.pipeline import align_reads_device

    idx, reads, _ = benchmod.build_world()
    n_bench = benchmod.CHR21_BENCH_READS
    from bwbble_tpu.formats.fastq import Reads
    reads = Reads(names=reads.names[:n_bench], seq=reads.seq[:n_bench],
                  rc=reads.rc[:n_bench], qual=reads.qual[:n_bench],
                  lengths=reads.lengths[:n_bench])
    didx = from_fmindex(idx)
    idx.bit_planes()

    params = AlnParams(max_diff=4, batch_size=lanes)
    backend = "auto" if fixed else "resident"
    xcap = int(os.environ.get("BWBBLE_QXCAP", "128"))
    flush = int(os.environ.get("BWBBLE_QFLUSH", "64"))
    qkx = int(os.environ.get("BWBBLE_QKX", "2"))
    cfg = EngineConfig(cap=cap, acap=24, kx=qkx, max_iters=500_000,
                       flush=flush,
                       backend=backend, xcap=0 if fixed else xcap)
    queued = not fixed

    t0 = time.time()
    align_reads_device(idx, didx, reads, params, cfg, d_cap=64,
                       queued=queued, qchunk=qchunk)
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    stats: dict = {}
    t0 = time.time()
    alns = align_reads_device(idx, didx, reads, params, cfg, d_cap=64,
                              stats=stats, queued=queued, qchunk=qchunk)
    dt = time.time() - t0
    n_aligned = sum(1 for a in alns if a)
    print(f"mode={'fixed' if fixed else 'queued-resident'} lanes={lanes} "
          f"cap={cap} qchunk={qchunk} align={dt:.2f}s "
          f"r/s={reads.count / dt:.1f} aligned={n_aligned}/{reads.count} "
          f"fallback={stats.get('fallback_reads')} "
          f"retried={stats.get('retried_reads')} "
          f"iters={stats.get('iters')} "
          f"t_dbounds={stats.get('t_dbounds')} "
          f"t_search={stats.get('t_search')} "
          f"t_host={stats.get('t_host')} tiers={stats.get('tiers')}")


if __name__ == "__main__":
    main()
