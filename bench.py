"""Headline benchmark: inexact alignment throughput (reads/s) on one chip.

Mirrors the BASELINE.md measurement: synthetic uniform-random 5 Mbp reference
(10 Mbp indexed with reverse complement), 10,240 simulated 100 bp reads with
2 mismatches on both strands, aligned with `-n 4` defaults (the reference
measured 5,100 reads/s/core on this workload; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 5100.0   # BASELINE.md: reference, 1 CPU core, -n 4
GENOME_BP = 5_000_000
NUM_READS = 16_384
READ_LEN = 100
NUM_MM = 2

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")


def build_world():
    from bwbble_tpu.formats.fasta import fasta2ref
    from bwbble_tpu.formats.fastq import read_fastq
    from bwbble_tpu.index.fmindex import FMIndex
    from bwbble_tpu.testutil import random_genome_fasta, simulate_reads_fastq

    os.makedirs(CACHE, exist_ok=True)
    fa = os.path.join(CACHE, "bench.fa")
    fq = os.path.join(CACHE, f"bench_{NUM_READS}.fq")
    bwt = os.path.join(CACHE, "bench.bwt")
    if not os.path.exists(fa):
        random_genome_fasta(fa, {"chr1": GENOME_BP}, seed=11)
    if not os.path.exists(fq):
        simulate_reads_fastq(fa, fq, NUM_READS, read_len=READ_LEN,
                             num_mm=NUM_MM, seed=13)
    if os.path.exists(bwt):
        idx = FMIndex.load(bwt)
    else:
        codes, _ann = fasta2ref(fa, os.path.join(CACHE, "bench.ref"),
                                os.path.join(CACHE, "bench.ann"))
        idx = FMIndex.build(codes)
        idx.store(bwt)
    reads = read_fastq(fq)
    return idx, reads


def main():
    t0 = time.time()
    idx, reads = build_world()
    t_build = time.time() - t0

    import jax
    from bwbble_tpu.align.params import AlnParams
    from bwbble_tpu.engine.device_index import from_fmindex
    from bwbble_tpu.engine.inexact import EngineConfig
    from bwbble_tpu.engine.pipeline import align_reads_device

    didx = from_fmindex(idx)
    params = AlnParams(max_diff=4, batch_size=8192)
    cfg = EngineConfig(cap=32768, acap=24, kx=2, max_iters=500_000)

    # warm-up: one full pass compiles every shape (batches, difficulty
    # scorer, path walk buckets)
    align_reads_device(idx, didx, reads, params, cfg, d_cap=16, queued=True)

    stats: dict = {}
    t1 = time.time()
    alns = align_reads_device(idx, didx, reads, params, cfg, d_cap=16,
                              stats=stats, queued=True)
    dt = time.time() - t1
    reads_per_sec = reads.count / dt

    n_aligned = sum(1 for a in alns if a)
    sys.stderr.write(
        f"backend={jax.default_backend()} index_build={t_build:.1f}s "
        f"align={dt:.2f}s aligned={n_aligned}/{reads.count} "
        f"fallback={stats.get('fallback_reads', 0)} "
        f"retried={stats.get('retried_reads', 0)}\n")
    print(json.dumps({
        "metric": "inexact_align_throughput",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
