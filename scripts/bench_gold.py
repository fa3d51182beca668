"""Microbenchmark: native gold engine on the chr21 workload (host, 1 core).

The chr21 bench routes its heavy tail (~28-40% of reads) to the native
gold engine, so its per-pop cost directly bounds the end-to-end number.
This script times that engine standalone on real chr21 reads and reports
reads/s and us/pop (the compiled reference does ~0.4 us/pop on the same
class of machine; scripts/measure_baseline.py measured 154 reads/s
end-to-end for it on this world).

Usage: python scripts/bench_gold.py [--n 256] [--offset 0] [--aln OUT]
"""

import argparse
import hashlib
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--world", default=None)
    ap.add_argument("--aln", default=None,
                    help="write results to this .aln (for parity diffing)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    world = args.world or os.path.join(repo, ".bench", "chr21")
    from bwbble_tpu.align.params import AlnParams
    from bwbble_tpu.align.pipeline import align_read_gold
    from bwbble_tpu.formats.fastq import read_fastq
    from bwbble_tpu.index import FMIndex
    from bwbble_tpu.native import get_native

    nat = get_native()
    assert nat is not None and nat._has_gold, "native gold engine required"

    idx = FMIndex.load(os.path.join(world, "mg_bubble.bwt"))
    idx.bit_planes()
    reads = read_fastq(os.path.join(world, "reads_16384.fq"))
    params = AlnParams(max_diff=4)

    N = min(args.n, reads.count - args.offset)
    t0 = time.time()
    total_pops = 0
    alns = []
    # count pops with the native wrapper's stats hook by calling the
    # engine once per read through the product path
    from bwbble_tpu.align import pipeline as P
    from bwbble_tpu import constants as C
    pp = np.array([
        params.mm_score, params.gapo_score, params.gape_score,
        params.max_diff, params.max_gapo, params.max_gape,
        params.seed_length, params.max_diff_seed, params.max_best,
        params.no_indel_length, params.max_entries,
        params.num_score_buckets], dtype=np.int64)
    tables = P._gold_tables()
    planes = idx.bit_planes()
    for r in range(args.offset, args.offset + N):
        stats = {}
        out = nat.gold_align_multiref(
            planes, idx.occ, idx.Carr, idx.length, idx.sa0,
            C.OCC_INTERVAL, tables, pp, reads.seq[r], reads.rc[r],
            int(reads.lengths[r]), stats=stats)
        total_pops += stats.get("pops", 0)
        alns.append(out)
    dt = time.time() - t0
    digest = hashlib.sha256()
    n_aln = 0
    for out in alns:
        if out is None:
            continue
        meta, paths = out
        n_aln += meta.shape[0]
        digest.update(meta.tobytes())
        digest.update(paths.tobytes())
    print(f"reads {N}  wall {dt:.2f}s  {N/dt:.1f} reads/s  "
          f"pops {total_pops}  {dt/max(total_pops,1)*1e6:.3f} us/pop  "
          f"alns {n_aln}  sha {digest.hexdigest()[:16]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
