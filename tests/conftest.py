"""Test configuration.

Device-engine tests run on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware; set before JAX initializes.
"""

import os
import subprocess

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself from sitecustomize and ignores the
# JAX_PLATFORMS env var; force the CPU backend after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "bwbble")
ORACLE_REF_SRC = "/root/reference/mg-aligner"


def _ensure_oracle() -> str | None:
    """Compile the reference aligner as a parity oracle if possible."""
    if os.path.exists(ORACLE):
        return ORACLE
    if not os.path.isdir(ORACLE_REF_SRC):
        return None
    os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
    import glob
    srcs = glob.glob(os.path.join(ORACLE_REF_SRC, "*.c"))
    try:
        subprocess.run(
            ["gcc", "-O3", "-std=gnu99", "-fopenmp", *srcs, "-o", ORACLE,
             "-lm", "-lz", "-lpthread"],
            check=True, capture_output=True, cwd="/tmp")
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return ORACLE if os.path.exists(ORACLE) else None


@pytest.fixture(scope="session")
def oracle():
    path = _ensure_oracle()
    if path is None:
        pytest.skip("reference oracle binary unavailable")
    return path


@pytest.fixture(scope="session")
def small_world(tmp_path_factory):
    """A small indexed genome + simulated reads shared across tests."""
    from bwbble_tpu.formats.fasta import fasta2ref
    from bwbble_tpu.formats.fastq import read_fastq
    from bwbble_tpu.index import FMIndex
    from bwbble_tpu.testutil import random_genome_fasta, simulate_reads_fastq

    d = tmp_path_factory.mktemp("world")
    fa = str(d / "g.fa")
    fq = str(d / "r.fq")
    random_genome_fasta(fa, {"chr1": 60_000, "chr2": 40_000}, seed=3,
                        iupac_frac=0.002)
    simulate_reads_fastq(fa, fq, 60, read_len=100, num_mm=2, seed=7)
    codes, ann = fasta2ref(fa, str(d / "g.fa.ref"), str(d / "g.fa.ann"))
    idx = FMIndex.build(codes)
    reads = read_fastq(fq)
    return {"dir": d, "fasta": fa, "fastq": fq, "codes": codes, "ann": ann,
            "idx": idx, "reads": reads}
