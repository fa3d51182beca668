"""Text .aln codec roundtrip and the simulation-truth evaluator (C16/C19)."""

import os

import numpy as np

from bwbble_tpu.align.evaluate import eval_alns
from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.align.pipeline import align_reads_gold
from bwbble_tpu.formats.aln import (
    read_aln_file, read_aln_text_file, write_aln_file, write_aln_text_file,
)


import pytest


@pytest.fixture(scope="module")
def one_chr_world(tmp_path_factory):
    """Single-chromosome world: the truth checker compares global fwd
    positions to chromosome-local truth (as the reference does), so the sim
    oracle only lines up when the genome has one sequence."""
    from bwbble_tpu.formats.fasta import fasta2ref
    from bwbble_tpu.formats.fastq import read_fastq
    from bwbble_tpu.index import FMIndex
    from bwbble_tpu.testutil import random_genome_fasta, simulate_reads_fastq

    d = tmp_path_factory.mktemp("evalworld")
    fa, fq = str(d / "g.fa"), str(d / "r.fq")
    random_genome_fasta(fa, {"chr1": 50_000}, seed=31)
    simulate_reads_fastq(fa, fq, 20, read_len=100, num_mm=1, seed=32)
    codes, _ = fasta2ref(fa, None, None)
    return {"idx": FMIndex.build(codes), "reads": read_fastq(fq)}


def _alns(world, n=16):
    reads = world["reads"]
    from bwbble_tpu.formats.fastq import Reads
    sub = Reads(names=reads.names[:n], seq=reads.seq[:n], rc=reads.rc[:n],
                qual=reads.qual[:n], lengths=reads.lengths[:n])
    return sub, align_reads_gold(world["idx"], sub, AlnParams(max_diff=2))


def test_text_codec_roundtrip(one_chr_world, tmp_path):
    _, alns = _alns(one_chr_world)
    tf = str(tmp_path / "t.aln")
    bf = str(tmp_path / "b.aln")
    write_aln_text_file(tf, alns)
    write_aln_file(bf, alns)
    t = read_aln_text_file(tf)
    b = read_aln_file(bf)
    # both readers return disk-order paths; records must agree completely
    assert len(t) == len(b) == len(alns)
    for ta, ba in zip(t, b):
        assert [(x.score, x.L, x.U, x.num_mm, x.num_gapo, x.num_gape,
                 x.aln_length, x.path) for x in ta] == \
               [(x.score, x.L, x.U, x.num_mm, x.num_gapo, x.num_gape,
                 x.aln_length, x.path) for x in ba]


def test_eval_alns_classifies(one_chr_world, tmp_path):
    sub, alns = _alns(one_chr_world, n=20)
    summary = eval_alns(one_chr_world["idx"], sub, alns, is_multiref=False,
                        out_dir=str(tmp_path))
    # simulated reads with <=2 mismatches must be overwhelmingly correct
    assert summary["total"] == 20
    assert summary["correct"] >= summary["confident"] - 2
    assert summary["confident"] >= 14
    for name in ("unaligned", "conf", "corr", "mis"):
        data = np.fromfile(tmp_path / f"bwbble.{name}", dtype="<i4")
        assert data[-1] == data.shape[0] - 1  # trailing count
    corr = np.fromfile(tmp_path / "bwbble.corr", dtype="<i4")[:-1]
    assert summary["correct"] == corr.shape[0]
