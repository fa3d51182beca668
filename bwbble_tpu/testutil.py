"""Synthetic data generation for tests and benchmarks.

Produces wgsim-style simulated reads whose names encode the ground truth
(`@chr_lpos_rpos_strand_mpos...`, parse_read_mapping io.c:529-562), matching
the reference's built-in simulation oracle (eval_alns, align.c:655-722).
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome_fasta(path: str, lengths: dict[str, int], seed: int = 0,
                        line_len: int = 60, iupac_frac: float = 0.0) -> None:
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for name, n in lengths.items():
            seq = BASES[rng.integers(0, 4, size=n)]
            if iupac_frac > 0:
                k = int(n * iupac_frac)
                pos = rng.choice(n, size=k, replace=False)
                snp_codes = np.frombuffer(b"RYSWKM", dtype=np.uint8)
                seq = seq.copy()
                seq[pos] = snp_codes[rng.integers(0, 6, size=k)]
            f.write(f">{name}\n")
            s = seq.tobytes().decode("ascii")
            for i in range(0, n, line_len):
                f.write(s[i:i + line_len] + "\n")


_COMPL = {65: "T", 67: "G", 71: "C", 84: "A"}


def simulate_reads_fastq(fasta_path: str, fastq_path: str, num_reads: int,
                         read_len: int = 100, num_mm: int = 2, seed: int = 1
                         ) -> None:
    """Sample reads from a FASTA with `num_mm` random substitutions; half the
    reads are reverse-complemented.  Truth is encoded in the read name."""
    rng = np.random.default_rng(seed)
    # parse fasta
    seqs: list[tuple[str, str]] = []
    name, chunks = None, []
    with open(fasta_path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    seqs.append((name, "".join(chunks)))
                name, chunks = line[1:].split()[0], []
            else:
                chunks.append(line.upper())
    if name is not None:
        seqs.append((name, "".join(chunks)))

    with open(fastq_path, "w") as f:
        for r in range(num_reads):
            chrom, seq = seqs[rng.integers(0, len(seqs))]
            start = int(rng.integers(0, len(seq) - read_len + 1))
            frag = list(seq[start:start + read_len])
            for _ in range(num_mm):
                p = int(rng.integers(0, read_len))
                frag[p] = "ACGT"[(("ACGT".find(frag[p]) if frag[p] in "ACGT"
                                   else 0) + int(rng.integers(1, 4))) % 4]
            strand = int(rng.integers(0, 2))
            read = "".join(frag)
            if strand:
                read = "".join(_COMPL.get(ord(ch), "N") for ch in reversed(read))
            lpos = start + 1
            rpos = start + read_len
            sname = f"{chrom}_{lpos}_{rpos}_{'c' if strand else 'nm'}_{lpos}_{r}"
            f.write(f"@{sname}\n{read}\n+\n{'2' * read_len}\n")
