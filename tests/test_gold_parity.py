"""End-to-end byte parity of the gold pipeline vs the compiled reference:
`.aln` and `.sam` must match exactly across configurations."""

import subprocess

import numpy as np
import pytest

from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.align.pipeline import align_reads_gold, alns_to_sam
from bwbble_tpu.formats.aln import read_aln_file, write_aln_file
from bwbble_tpu.formats.fasta import fasta2ref, read_ann
from bwbble_tpu.formats.fastq import read_fastq
from bwbble_tpu.index import FMIndex
from bwbble_tpu.testutil import random_genome_fasta, simulate_reads_fastq


def run_parity(tmp_path, oracle, *, n_reads=40, num_mm=1, iupac=0.002,
               align_args=(), params=None, indel_reads=False, seed=9):
    fa = str(tmp_path / "g.fa")
    fq = str(tmp_path / "r.fq")
    random_genome_fasta(fa, {"c1": 50_000, "c2": 30_000}, seed=seed,
                        iupac_frac=iupac)
    simulate_reads_fastq(fa, fq, n_reads, read_len=100, num_mm=num_mm,
                         seed=seed + 1)
    if indel_reads:
        _add_indel_reads(fa, fq, n=8, seed=seed + 2)

    subprocess.run([oracle, "index", fa], check=True, capture_output=True)
    o_aln = str(tmp_path / "o.aln")
    o_sam = str(tmp_path / "o.sam")
    subprocess.run([oracle, "align", *align_args, fa, fq, o_aln],
                   check=True, capture_output=True)
    sam_args = ["-S", "x"] if params and not params.is_multiref else []
    subprocess.run([oracle, "aln2sam", *sam_args, fa, fq, o_aln, o_sam],
                   check=True, capture_output=True)

    codes, ann = fasta2ref(fa, None, None)
    idx = FMIndex.build(codes)
    reads = read_fastq(fq)
    params = params or AlnParams()
    alns = align_reads_gold(idx, reads, params)
    m_aln = str(tmp_path / "m.aln")
    write_aln_file(m_aln, alns)
    assert open(o_aln, "rb").read() == open(m_aln, "rb").read(), \
        "aln byte mismatch"
    sam = alns_to_sam(idx, read_ann(fa + ".ann"), reads, read_aln_file(m_aln),
                      max_diff=6)
    assert sam == open(o_sam).read(), "sam byte mismatch"


def _add_indel_reads(fa, fq, n, seed):
    """Append reads carrying a 1-3bp insertion or deletion."""
    rng = np.random.default_rng(seed)
    seqs = {}
    name = None
    for line in open(fa):
        line = line.strip()
        if line.startswith(">"):
            name = line[1:].split()[0]
            seqs[name] = []
        else:
            seqs[name].append(line)
    seqs = {k: "".join(v) for k, v in seqs.items()}
    with open(fq, "a") as f:
        for r in range(n):
            chrom = list(seqs)[rng.integers(0, len(seqs))]
            s = seqs[chrom]
            start = int(rng.integers(0, len(s) - 120))
            frag = list(s[start:start + 110])
            gap = int(rng.integers(1, 4))
            pos = int(rng.integers(20, 80))
            if rng.integers(0, 2):
                del frag[pos:pos + gap]     # deletion from the read
            else:
                frag[pos:pos] = list("ACGT"[int(rng.integers(0, 4))] * gap)
            read = "".join(frag[:100])
            f.write(f"@{chrom}_{start+1}_{start+100}_nm_{start+1}_i{r}\n"
                    f"{read}\n+\n{'2'*100}\n")


def test_parity_default_n0(tmp_path, oracle):
    run_parity(tmp_path, oracle, num_mm=0, params=AlnParams())


def test_parity_n2_multiref(tmp_path, oracle):
    run_parity(tmp_path, oracle, num_mm=2, align_args=("-n", "2"),
               params=AlnParams(max_diff=2))


def test_parity_n4_with_indels(tmp_path, oracle):
    run_parity(tmp_path, oracle, num_mm=2, align_args=("-n", "4"),
               params=AlnParams(max_diff=4), indel_reads=True)


def test_parity_single_genome(tmp_path, oracle):
    run_parity(tmp_path, oracle, num_mm=2, iupac=0.0,
               align_args=("-n", "2", "-S"),
               params=AlnParams(max_diff=2, is_multiref=False))


def test_parity_n_reads_with_Ns(tmp_path, oracle):
    # reads containing N must be treated as mismatches / discarded
    fa = str(tmp_path / "g.fa")
    fq = str(tmp_path / "r.fq")
    random_genome_fasta(fa, {"c1": 30_000}, seed=21, iupac_frac=0.001)
    simulate_reads_fastq(fa, fq, 12, read_len=80, num_mm=1, seed=22)
    # corrupt some reads with Ns
    lines = open(fq).read().splitlines()
    for k in [1, 5, 9]:
        s = list(lines[k])
        s[10] = "N"
        s[50] = "N"
        lines[k] = "".join(s)
    open(fq, "w").write("\n".join(lines) + "\n")
    subprocess.run([oracle, "index", fa], check=True, capture_output=True)
    o_aln = str(tmp_path / "o.aln")
    subprocess.run([oracle, "align", "-n", "1", fa, fq, o_aln], check=True,
                   capture_output=True)
    codes, _ = fasta2ref(fa, None, None)
    idx = FMIndex.build(codes)
    reads = read_fastq(fq)
    alns = align_reads_gold(idx, reads, AlnParams(max_diff=1))
    m_aln = str(tmp_path / "m.aln")
    write_aln_file(m_aln, alns)
    assert open(o_aln, "rb").read() == open(m_aln, "rb").read()
