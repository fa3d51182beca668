"""Host alignment pipeline drivers.

`align_reads_gold` runs the full reference-semantics pipeline on the host
(align_reads + align_reads_inexact, align.c:40-87 / inexact_match.c:25-89);
the device pipeline in bwbble_tpu.engine.pipeline produces identical results
with the heavy loops on TPU and falls back to these functions per read on
capacity overflow.
"""

from __future__ import annotations

import numpy as np

from bwbble_tpu.align.eval import finalize_read, pick_hits, resolve_sa_gold
from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.formats.fasta import Annotations
from bwbble_tpu.formats.fastq import Reads
from bwbble_tpu.formats.sam import format_sam_record, write_sam_header
from bwbble_tpu.gold import engine as G
from bwbble_tpu.index.fmindex import FMIndex


def align_read_gold(idx: FMIndex, seq: np.ndarray, rc: np.ndarray,
                    length: int, params: AlnParams,
                    precalc=None) -> list[G.Aln]:
    """Align one read (the per-read body of align_reads_inexact,
    inexact_match.c:46-66)."""
    if params.use_precalc:
        ri = G.read2index(rc, length, k=params.precalc_len)
        if ri < 0:
            return []
        precalc_intvs = precalc[ri]
    else:
        precalc_intvs = None
    D = G.calculate_d(idx, seq, length, params)
    if params.seed_length and length > params.seed_length:
        D_seed = G.calculate_d(idx, seq, params.seed_length, params)
    else:
        D_seed = np.zeros((params.seed_length + 1, 2), dtype=np.int64)
    return G.inexact_match(idx, rc, length, params, D, D_seed, precalc_intvs)


def align_reads_gold(idx: FMIndex, reads: Reads, params: AlnParams,
                     precalc=None) -> list[list[G.Aln]]:
    return [
        align_read_gold(idx, reads.seq[i], reads.rc[i], int(reads.lengths[i]),
                        params, precalc)
        for i in range(reads.count)
    ]


def alns_to_sam(idx: FMIndex, ann: Annotations, reads: Reads,
                per_read_alns, max_diff: int = 6,
                sa_resolver=None) -> str:
    """Evaluate alignments and render SAM text (alns2sam, align.c:494-556).

    `per_read_alns` entries must carry disk-order paths (as returned by
    formats.aln.read_aln_file).  `sa_resolver(rows)->positions` defaults to
    the host gold resolver; the device pipeline passes a batched TPU kernel.
    """
    hits = [pick_hits(a) for a in per_read_alns]
    mapped = [k for k, h in enumerate(hits) if h.aln_type != 0]
    rows = np.array([hits[k].aln_sa for k in mapped], dtype=np.int64)
    if sa_resolver is None:
        positions = resolve_sa_gold(idx, rows)
    else:
        positions = np.asarray(sa_resolver(rows), dtype=np.int64)
    for k, pos in zip(mapped, positions):
        finalize_read(hits[k], int(pos), idx.length, max_diff)

    import io
    out = io.StringIO()
    write_sam_header(out, ann)
    n = min(reads.count, len(per_read_alns))
    for k in range(n):
        out.write(format_sam_record(
            reads.names[k], reads.seq[k], reads.rc[k], reads.qual[k],
            int(reads.lengths[k]), hits[k], ann))
    return out.getvalue()
