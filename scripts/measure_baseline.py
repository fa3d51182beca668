"""Measure the reference C aligner on the headline bench workload.

Builds (or reuses) the exact world bench.py uses, compiles the reference
(gcc -O3, same flags as tests/conftest.py), runs `bwbble index` +
`bwbble align -n 4` on one core, and records reads/s into
.bench/chr21/baseline.json — the number bench.py divides by.

Run: python scripts/measure_baseline.py [--easy]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def oracle_binary() -> str:
    exe = os.path.join(ROOT, ".oracle", "bwbble")
    if not os.path.exists(exe):
        os.makedirs(os.path.dirname(exe), exist_ok=True)
        import glob
        srcs = glob.glob("/root/reference/mg-aligner/*.c")
        subprocess.run(["gcc", "-O3", "-std=gnu99", "-fopenmp", *srcs,
                        "-o", exe, "-lm", "-lz", "-lpthread"], check=True)
    return exe


def main():
    easy = "--easy" in sys.argv
    hard = "--hard" in sys.argv
    import bench as benchmod
    if easy:
        _idx, reads, world = benchmod.build_world_easy()
        fa = os.path.join(world, "bench.fa")
        fq = os.path.join(world, f"bench_{benchmod.NUM_READS}.fq")
        out = os.path.join(world, "baseline_easy.json")
    else:
        _idx, reads, world = benchmod.build_world(hard=hard)
        fa = os.path.join(world, "mg_bubble.fa")
        fq = os.path.join(world, f"reads_{benchmod.NUM_READS}.fq")
        out = os.path.join(world, "baseline.json")

    exe = oracle_binary()
    # the oracle writes <fa>.{ref,ann,bwt} next to the fasta; keep a copy so
    # our own artifacts aren't clobbered
    import shutil
    ofa = os.path.join(world, "oracle_" + os.path.basename(fa))
    if not os.path.exists(ofa):
        shutil.copy(fa, ofa)
    if not os.path.exists(ofa + ".bwt"):
        t0 = time.time()
        subprocess.run([exe, "index", ofa], check=True,
                       stdout=subprocess.DEVNULL)
        print(f"oracle index: {time.time() - t0:.1f}s")

    aln = os.path.join(world, "oracle.aln")
    if os.path.exists(aln):
        os.remove(aln)
    t0 = time.time()
    r = subprocess.run([exe, "align", "-n", "4", ofa, fq, aln],
                       check=True, capture_output=True, text=True)
    dt = time.time() - t0
    # the reference prints its own matching time; prefer the wall clock of
    # the align subcommand minus load phases if parseable, else total
    # cumulative across batches (inexact_match.c:67): take the last
    m = re.findall(r"Inexact matching time: ([0-9.]+) sec", r.stdout)
    t_match = float(m[-1]) if m else dt
    rps_total = reads.count / dt
    rps_match = reads.count / t_match if t_match > 0 else rps_total
    print(f"oracle align: total {dt:.2f}s ({rps_total:.0f} reads/s), "
          f"matching {t_match:.2f}s ({rps_match:.0f} reads/s)")
    with open(out, "w") as f:
        json.dump({"reads_per_sec": round(rps_total, 1),
                   "reads_per_sec_matching_only": round(rps_match, 1),
                   "align_wall_s": round(dt, 3),
                   "matching_s": round(t_match, 3),
                   "num_reads": reads.count,
                   "cmd": f"bwbble align -n 4 (gcc -O3, 1 core)",
                   "date": time.strftime("%Y-%m-%d")}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
