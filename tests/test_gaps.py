"""Gap-alignment parity: reads with insertions/deletions relative to the
genome must produce byte-identical .aln and SAM (I/D CIGAR runs, gap dedup,
strand-reversed CIGARs) vs the reference binary."""

import os
import subprocess

import numpy as np
import pytest

from bwbble_tpu.cli import main
from bwbble_tpu.testutil import random_genome_fasta


@pytest.fixture(scope="module")
def gap_world(tmp_path_factory, oracle):
    d = tmp_path_factory.mktemp("gaps")
    fa = str(d / "g.fa")
    rng = np.random.default_rng(17)
    random_genome_fasta(fa, {"chrG": 30_000}, seed=18)
    seq = "".join(l.strip() for l in open(fa) if not l.startswith(">"))

    def rc(s):
        return "".join({"A": "T", "C": "G", "G": "C", "T": "A"}[c]
                       for c in reversed(s))

    reads = []
    for k in range(6):
        start = 1000 + 3000 * k
        window = seq[start:start + 61]
        if k % 3 == 0:      # deletion in the read (ref char skipped)
            r = window[:30] + window[31:61]        # 60 bp
        elif k % 3 == 1:    # insertion in the read
            r = window[:30] + "ACGT"[k % 4] + window[30:59]  # 60 bp
        else:               # clean
            r = window[:60]
        if k >= 3:
            r = rc(r)
        reads.append((f"gap{k}", r))
    fq = str(d / "r.fq")
    with open(fq, "w") as f:
        for n, s in reads:
            f.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    return {"d": d, "fa": fa, "fq": fq, "oracle": oracle}


def test_gap_alignment_parity(gap_world, tmp_path):
    d, fa, fq = gap_world["d"], gap_world["fa"], gap_world["fq"]
    assert main(["index", fa]) == 0
    assert main(["align", "-n", "3", fa, fq, str(d / "g.aln")]) == 0
    assert main(["aln2sam", "-n", "3", fa, fq, str(d / "g.aln"),
                 str(d / "g.sam")]) == 0

    import shutil
    o = tmp_path
    shutil.copy(fa, o / "o.fa")
    shutil.copy(fq, o / "o.fq")
    for cmd in ([gap_world["oracle"], "index", "o.fa"],
                [gap_world["oracle"], "align", "-n", "3", "o.fa", "o.fq",
                 "o.aln"],
                [gap_world["oracle"], "aln2sam", "-n", "3", "o.fa", "o.fq",
                 "o.aln", "o.sam"]):
        r = subprocess.run([str(c) for c in cmd], cwd=o, capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stdout + r.stderr
    assert open(d / "g.aln", "rb").read() == open(o / "o.aln", "rb").read()
    assert open(d / "g.sam", "rb").read() == open(o / "o.sam", "rb").read()

    # the indel reads must actually carry I/D CIGAR ops
    cigars = [l.split("\t")[5] for l in open(d / "g.sam")
              if l.startswith("gap")]
    assert any("D" in c for c in cigars), cigars
    assert any("I" in c for c in cigars), cigars
