"""mg-ref toolchain parity: our C++ tools vs the reference mg-ref binaries
(data_prep.cpp / comb.cpp / sam_pad.cpp) on synthetic VCF + FASTA inputs.
Every output file must match byte-for-byte."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OURS = os.path.join(REPO, "native", "build", "mgref")
ORACLE_DIR = os.path.join(REPO, ".oracle")
REF_SRC = "/root/reference/mg-ref"


@pytest.fixture(scope="module")
def tools():
    if not os.path.exists(OURS):
        pytest.skip("native mgref not built (python -m bwbble_tpu.build_native)")
    oracle = {}
    for t in ("data_prep", "comb", "sam_pad"):
        path = os.path.join(ORACLE_DIR, t)
        if not os.path.exists(path):
            src = os.path.join(REF_SRC, f"{t}.cpp")
            if not os.path.exists(src):
                pytest.skip("reference mg-ref sources unavailable")
            os.makedirs(ORACLE_DIR, exist_ok=True)
            try:
                subprocess.run(["g++", "-O2", src, "-o", path], check=True,
                               capture_output=True)
            except subprocess.CalledProcessError:
                pytest.skip(f"cannot compile reference {t}")
        oracle[t] = path
    return oracle


def _write_inputs(d):
    rng = np.random.default_rng(5)
    bases = "ACGT"
    seqs = {}
    fa = d / "ref.fa"
    with open(fa, "w") as f:
        for chrom, n in (("21", 2400), ("22", 1700)):
            s = "".join(bases[i] for i in rng.integers(0, 4, n))
            seqs[chrom] = s
            f.write(f">{chrom}\n")
            for i in range(0, n, 60):
                f.write(s[i:i + 60] + "\n")

    vcf = d / "vars.vcf"
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.1\n##source=synthetic\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\tS1\tS2\tS3\n")
        for chrom in ("21", "22"):
            n = len(seqs[chrom])
            for k in range(40):
                pos = int(rng.integers(130, n - 130))
                ref = seqs[chrom][pos - 1]
                kind = rng.integers(0, 3)
                gts = ["0|0", "1|0", "0|1", "1|1"]
                gt = "\t".join(gts[int(g)] for g in rng.integers(0, 4, 3))
                if kind == 0:   # SNP (possibly multi-allelic)
                    alts = [b for b in bases if b != ref]
                    alt = ",".join(alts[:int(rng.integers(1, 3))])
                    f.write(f"{chrom}\t{pos}\trs{k}\t{ref}\t{alt}\t100\t"
                            f"PASS\tVT=SNP;AF=0.1\tGT\t{gt}\n")
                elif kind == 1:  # insertion
                    ins = ref + "".join(bases[i] for i in
                                        rng.integers(0, 4, rng.integers(1, 5)))
                    f.write(f"{chrom}\t{pos}\trs{k}\t{ref}\t{ins}\t100\t"
                            f"PASS\tVT=INDEL;AF=0.1\tGT\t{gt}\n")
                else:           # deletion
                    dl = int(rng.integers(2, 6))
                    refs = seqs[chrom][pos - 1: pos - 1 + dl]
                    f.write(f"{chrom}\t{pos}\trs{k}\t{refs}\t{refs[0]}\t100\t"
                            f"PASS\tVT=INDEL;AF=0.1\tGT\t{gt}\n")
    return fa, vcf


def _run(cwd, exe, *args):
    os.makedirs(cwd / "mg-ref-output", exist_ok=True)
    r = subprocess.run([str(exe), *[str(a) for a in args]], cwd=cwd,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr + r.stdout
    return r


@pytest.fixture(scope="module")
def pipelines(tools, tmp_path_factory):
    base = tmp_path_factory.mktemp("mgref")
    fa, vcf = _write_inputs(base)
    dirs = {}
    for side, (dp, cb) in (("ours", (OURS, OURS)),
                           ("oracle", (tools["data_prep"], tools["comb"]))):
        d = base / side
        os.makedirs(d, exist_ok=True)
        if side == "ours":
            _run(d, dp, "data_prep", "-c", vcf)
            _run(d, cb, "comb", "-w", "30", fa, d / "mg.fa",
                 d / "mg_bubble.fa", d / "bubble.data")
        else:
            _run(d, dp, "-c", vcf)
            _run(d, cb, "-w", "30", fa, d / "mg.fa", d / "mg_bubble.fa",
                 d / "bubble.data")
        dirs[side] = d
    return dirs


def test_data_prep_extracts_match(pipelines):
    ours, oracle = pipelines["ours"], pipelines["oracle"]
    names = sorted(os.listdir(oracle / "mg-ref-output"))
    assert names and names == sorted(os.listdir(ours / "mg-ref-output"))
    for n in names:
        a = open(ours / "mg-ref-output" / n, "rb").read()
        b = open(oracle / "mg-ref-output" / n, "rb").read()
        assert a == b, f"extract mismatch: {n}"


def test_comb_outputs_match(pipelines):
    ours, oracle = pipelines["ours"], pipelines["oracle"]
    for n in ("mg.fa", "mg_bubble.fa", "bubble.data"):
        a = open(ours / n, "rb").read()
        b = open(oracle / n, "rb").read()
        assert a == b, f"comb output mismatch: {n}"


def test_sam_pad_matches(pipelines, tools, tmp_path):
    ours, oracle = pipelines["ours"], pipelines["oracle"]
    bd = oracle / "bubble.data"
    n_bubbles = sum(1 for _ in open(bd)) // 2
    assert n_bubbles > 0
    sam = tmp_path / "in.sam"
    with open(sam, "w") as f:
        f.write("@SQ\tSN:21\tLN:2400\n@PG\tID:bwbble\n")
        # hits in the left pad, inside the indel, and in the right pad,
        # plus a non-bubble line that must pass through unchanged
        for i, pos in ((0, 1), (0, 31), (0, 40),
                       (min(1, n_bubbles - 1), 33)):
            f.write(f"r{i}_{pos}\t0\tbubble{i}\t{pos}\t37\t20M\t*\t0\t0\t"
                    f"{'A' * 20}\t{'2' * 20}\n")
        f.write(f"r_plain\t0\t21\t100\t37\t20M\t*\t0\t0\t{'A' * 20}\t"
                f"{'2' * 20}\n")
    a_out, b_out = tmp_path / "ours.sam", tmp_path / "oracle.sam"
    _run(tmp_path, OURS, "sam_pad", bd, sam, a_out)
    _run(tmp_path, tools["sam_pad"], bd, sam, b_out)
    assert open(a_out, "rb").read() == open(b_out, "rb").read()
