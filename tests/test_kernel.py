"""Pallas loop-body kernel parity: the fused kernel (engine/kernel.py,
interpreter mode on CPU) must reproduce the XLA body's results exactly —
same alignments, same node ids, same iteration/overflow accounting, same
reconstructed state paths."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from bwbble_tpu import constants as C
from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.engine import device_index as DI
from bwbble_tpu.engine import kernel as PK
from bwbble_tpu.engine.inexact import EngineConfig, inexact_search, walk_paths
from bwbble_tpu.engine.pipeline import _calc_d_chunk
from bwbble_tpu.formats.fastq import parse_fastq_bytes
from bwbble_tpu.index import FMIndex


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(177)
    seq = rng.integers(1, 16, size=4000).astype(np.uint8)
    acgt = np.array([15, 3, 7, 1], dtype=np.uint8)
    seq[:3300] = acgt[rng.integers(0, 4, size=3300)]
    seq[1600] = 0
    # fwd + IUPAC reverse complement, as fasta2ref lays the index out
    # (io.c:190-321): searches run the read's RC, which lands on the RC
    # half — without it every fwd-strand read misses and the o_* parity
    # comparisons are vacuous
    seq = np.concatenate([seq, C.IUPAC_COMPL[seq[::-1]]])
    idx = FMIndex.build(seq)
    didx = DI.from_fmindex(idx)
    reads = []
    L = 32
    chars = "AGCT"
    for r in range(48):
        s = int(rng.integers(0, 3300 - L))
        frag = [chars[int(C.NT4_TABLE[C.IUPAC_CHAR[x]])]
                if C.IUPAC_CHAR[x] in b"ACGT" else "A" for x in seq[s:s + L]]
        for _ in range(int(rng.integers(0, 3))):
            frag[int(rng.integers(0, L))] = chars[int(rng.integers(0, 4))]
        if r % 11 == 5:
            p = int(rng.integers(2, L - 4))
            del frag[p]                      # 1 bp deletion: exercises gaps
            frag.append(chars[int(rng.integers(0, 4))])
        reads.append("".join(frag))
    fq = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                 for i, s in enumerate(reads))
    return idx, didx, parse_fastq_bytes(fq.encode())


def _run(didx, reads, params, cfg, idx):
    B = 128
    Lmax = reads.max_len
    rc = np.zeros((B, Lmax), dtype=np.int8)
    rc[:reads.count] = reads.rc
    rc[reads.count:] = reads.rc[0]
    lengths = np.full(B, reads.lengths[0], dtype=np.int32)
    lengths[:reads.count] = reads.lengths
    D, Ds, _ = _calc_d_chunk(didx, jnp.asarray(rc), jnp.asarray(lengths),
                             lengths, params, K=16)
    res = inexact_search(didx, jnp.asarray(rc), jnp.asarray(lengths),
                         D, Ds, params, cfg)
    return {k: np.asarray(v) for k, v in res.items()}


def test_kernel_matches_xla_body(world):
    idx, didx, reads = world
    params = AlnParams(max_diff=3, batch_size=128)
    cfg = EngineConfig(cap=4096, acap=24, kx=4, max_iters=20_000,
                       backend="xla")
    ref = _run(didx, reads, params, cfg, idx)

    PK.INTERPRET = True
    try:
        got = _run(didx, reads, params,
                   dataclasses.replace(cfg, backend="pallas"), idx)
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "iters", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    # reconstructed state paths of every reported alignment must match
    lanes_l, nodes_l = [], []
    for b in range(reads.count):
        if ref["overflow"][b]:
            continue
        for k in range(int(ref["n_alns"][b])):
            lanes_l.append(b)
            nodes_l.append(int(ref["o_node"][b, k]))
    if lanes_l:
        W = max(256, len(lanes_l))
        lanes_a = np.zeros(W, dtype=np.int32)
        nodes_a = np.full(W, -1, dtype=np.int32)
        lanes_a[:len(lanes_l)] = lanes_l
        nodes_a[:len(nodes_l)] = nodes_l
        nc = 11
        kw = dict(nroot=1, nslot=1 + 2 * nc, nc=nc,
                  pathcap=reads.max_len + 32)
        p_ref = np.asarray(walk_paths(ref["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw))
        p_got = np.asarray(walk_paths(got["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw))
        np.testing.assert_array_equal(p_ref[:len(lanes_l)],
                                      p_got[:len(lanes_l)])


def test_kernel_deep_tier_matches_xla_body(world):
    """Escalation-ladder tier shape (kx=8, acap=64 — pipeline.py ladder):
    the kernel's rank-row stream carries 2+2*kx rows and the nxt
    feed-forward must be padded past them (kernel.py NXW); a fixed-width
    nxt underflows the row stream at kx=8 (the r2 chr21 bench crash)."""
    idx, didx, reads = world
    params = AlnParams(max_diff=3, batch_size=128)
    cfg = EngineConfig(cap=8192, acap=64, kx=8, max_iters=20_000,
                       backend="xla")
    ref = _run(didx, reads, params, cfg, idx)

    PK.INTERPRET = True
    try:
        got = _run(didx, reads, params,
                   dataclasses.replace(cfg, backend="pallas"), idx)
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "iters", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)


def test_resident_kernel_matches_xla_body(world):
    """The resident multi-pop kernel (whole loop inside ONE pallas_call,
    in-kernel DMA for arena pops / rank rows / frame writes) must
    reproduce the XLA body exactly — including the arena content the
    path walks read."""
    idx, didx, reads = world
    params = AlnParams(max_diff=3, batch_size=128)
    cfg = EngineConfig(cap=4096, acap=24, kx=4, max_iters=20_000,
                       backend="xla")
    ref = _run(didx, reads, params, cfg, idx)

    PK.INTERPRET = True
    try:
        got = _run(didx, reads, params,
                   dataclasses.replace(cfg, backend="resident"), idx)
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "iters", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    lanes_l, nodes_l = [], []
    for b in range(reads.count):
        if ref["overflow"][b]:
            continue
        for k in range(int(ref["n_alns"][b])):
            lanes_l.append(b)
            nodes_l.append(int(ref["o_node"][b, k]))
    if lanes_l:
        W = max(256, len(lanes_l))
        lanes_a = np.zeros(W, dtype=np.int32)
        nodes_a = np.full(W, -1, dtype=np.int32)
        lanes_a[:len(lanes_l)] = lanes_l
        nodes_a[:len(nodes_l)] = nodes_l
        nc = 11
        kw = dict(nroot=1, nslot=1 + 2 * nc, nc=nc,
                  pathcap=reads.max_len + 32)
        p_ref = np.asarray(walk_paths(ref["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw))
        p_got = np.asarray(walk_paths(got["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw))
        np.testing.assert_array_equal(p_ref[:len(lanes_l)],
                                      p_got[:len(lanes_l)])


@pytest.mark.parametrize("backend", ["pallas", "resident"])
def test_kernel_seeded_matches_xla_body(world, backend):
    """-P coverage (VERDICT r2 item 4): precalc-seeded searches (NROOT > 1
    root rows per lane, align.c:200-238) on the Pallas per-iteration
    kernel must reproduce the XLA body exactly.  backend='resident'
    covers the NROOT == 1 scope only and must route seeded searches to
    the per-iteration kernel instead of raising."""
    from bwbble_tpu.align.precalc import build_precalc_gold, read_indices

    idx, didx, reads = world
    K, S = 4, 128       # IUPAC-dense world: k=4 kmers carry up to ~96
    params = AlnParams(max_diff=3, batch_size=128, use_precalc=True,
                       precalc_len=K)
    table = build_precalc_gold(idx, params, k=K)

    B = 128
    Lmax = reads.max_len
    rc = np.zeros((B, Lmax), dtype=np.int8)
    rc[:reads.count] = reads.rc
    rc[reads.count:] = reads.rc[0]
    lengths = np.full(B, reads.lengths[0], dtype=np.int32)
    lengths[:reads.count] = reads.lengths
    ri = read_indices(rc, lengths, k=K)
    sL, sU, scnt, sover = table.lookup_batch(ri, S)
    assert not sover.any()
    assert int(scnt.max()) > 1          # real multi-root lanes
    D, Ds, _ = _calc_d_chunk(didx, jnp.asarray(rc), jnp.asarray(lengths),
                             lengths, params, K=16)
    cfg = EngineConfig(cap=8192, acap=24, kx=4, max_iters=40_000,
                       backend="xla")
    kw = dict(seed_L=jnp.asarray(sL), seed_U=jnp.asarray(sU),
              seed_cnt=jnp.asarray(scnt))
    ref = inexact_search(didx, jnp.asarray(rc), jnp.asarray(lengths),
                         D, Ds, params, cfg, **kw)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    assert int(ref["n_alns"][:reads.count].sum()) > 0

    PK.INTERPRET = True
    try:
        got = inexact_search(didx, jnp.asarray(rc), jnp.asarray(lengths),
                             D, Ds, params,
                             dataclasses.replace(cfg, backend=backend),
                             **kw)
        got = {k: np.asarray(v) for k, v in got.items()}
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "iters", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    lanes_l, nodes_l = [], []
    for b in range(reads.count):
        if ref["overflow"][b]:
            continue
        for k in range(int(ref["n_alns"][b])):
            lanes_l.append(b)
            nodes_l.append(int(ref["o_node"][b, k]))
    if lanes_l:
        W = max(256, len(lanes_l))
        lanes_a = np.zeros(W, dtype=np.int32)
        nodes_a = np.full(W, -1, dtype=np.int32)
        lanes_a[:len(lanes_l)] = lanes_l
        nodes_a[:len(nodes_l)] = nodes_l
        nc = 11
        kw2 = dict(nroot=S, nslot=1 + 2 * nc, nc=nc,
                   pathcap=reads.max_len + 32)
        p_ref = np.asarray(walk_paths(ref["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw2))
        p_got = np.asarray(walk_paths(got["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw2))
        np.testing.assert_array_equal(p_ref[:len(lanes_l)],
                                      p_got[:len(lanes_l)])


@pytest.fixture(scope="module")
def world_sg():
    """Single-genome (-S) world: pure-ACGT reference, exact 1-to-1 rank
    semantics (bwt.c:440-463 rank_actg / exact_match_1to1_bounded)."""
    rng = np.random.default_rng(377)
    acgt = np.asarray(C.NT4_GRAY[:4], dtype=np.uint8)
    seq = acgt[rng.integers(0, 4, size=4000)].astype(np.uint8)
    seq[1600] = 0
    seq = np.concatenate([seq, C.IUPAC_COMPL[seq[::-1]]])  # fwd + RC half
    idx = FMIndex.build(seq)
    didx = DI.from_fmindex(idx)
    gray_to_base = {int(g): b for b, g in enumerate(C.NT4_GRAY[:4])}
    reads = []
    L = 32
    chars = "AGCT"
    for r in range(48):
        s = int(rng.integers(0, 3900 - L))
        frag = [chars[gray_to_base.get(int(x), 0)] for x in seq[s:s + L]]
        for _ in range(int(rng.integers(0, 3))):
            frag[int(rng.integers(0, L))] = chars[int(rng.integers(0, 4))]
        if r % 11 == 5:
            p = int(rng.integers(2, L - 4))
            del frag[p]                      # 1 bp deletion: exercises gaps
            frag.append(chars[int(rng.integers(0, 4))])
        reads.append("".join(frag))
    fq = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                 for i, s in enumerate(reads))
    return idx, didx, parse_fastq_bytes(fq.encode())


@pytest.mark.parametrize("backend", ["pallas", "resident"])
def test_kernel_single_genome_matches_xla_body(world_sg, backend):
    """-S coverage (VERDICT r2 item 4): both the per-iteration Pallas
    body and the resident multi-pop kernel must reproduce the XLA body
    exactly in single-genome mode (chars = the 4 pure Gray codes,
    rank_actg expansion semantics, single-interval exact completion)."""
    idx, didx, reads = world_sg
    params = AlnParams(max_diff=3, batch_size=128, is_multiref=False)
    cfg = EngineConfig(cap=4096, acap=24, kx=4, max_iters=20_000,
                       backend="xla")
    ref = _run(didx, reads, params, cfg, idx)
    assert int(np.asarray(ref["n_alns"]).sum()) > 0

    PK.INTERPRET = True
    try:
        got = _run(didx, reads, params,
                   dataclasses.replace(cfg, backend=backend), idx)
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "iters", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    lanes_l, nodes_l = [], []
    for b in range(reads.count):
        if ref["overflow"][b]:
            continue
        for k in range(int(ref["n_alns"][b])):
            lanes_l.append(b)
            nodes_l.append(int(ref["o_node"][b, k]))
    if lanes_l:
        W = max(256, len(lanes_l))
        lanes_a = np.zeros(W, dtype=np.int32)
        nodes_a = np.full(W, -1, dtype=np.int32)
        lanes_a[:len(lanes_l)] = lanes_l
        nodes_a[:len(nodes_l)] = nodes_l
        nc = 4
        kw = dict(nroot=1, nslot=1 + 2 * nc, nc=nc,
                  pathcap=reads.max_len + 32)
        p_ref = np.asarray(walk_paths(ref["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw))
        p_got = np.asarray(walk_paths(got["arena"], jnp.asarray(lanes_a),
                                      jnp.asarray(nodes_a), **kw))
        np.testing.assert_array_equal(p_ref[:len(lanes_l)],
                                      p_got[:len(lanes_l)])


def test_resident_xcap_matches_gold(tmp_path):
    """Chunked exact completion (cfg.xcap): on an IUPAC-dense world whose
    completion interval lists blow past the legacy kx slots, the resident
    kernel must resolve the reads (no overflow) and match the gold engine
    alignment-for-alignment — the capability that lets the device own the
    reads the round-2 engine shipped to the host for kx overflow."""
    from bwbble_tpu.align.pipeline import align_read_gold
    from bwbble_tpu.engine.pipeline import _reconstruct_path

    rng = np.random.default_rng(991)
    base = rng.integers(0, 4, size=1500)             # nt4 over a 500-block
    block = base.copy()
    seq_blocks = []
    for rep in range(3):                             # repeats widen lists
        blk = block.copy()
        mut = rng.random(blk.size) < (0.02 * rep)
        blk[mut] = rng.integers(0, 4, size=int(mut.sum()))
        seq_blocks.append(blk)
    acgt_codes = np.array([8, 4, 2, 1], dtype=np.uint8)   # A,C,G,T masks
    cat = np.concatenate(seq_blocks)
    codes = acgt_codes[cat]
    # fold SNPs in: ~1/12 positions gain a second base bit (IUPAC code)
    snp = rng.random(codes.size) < 1 / 6.0
    other = acgt_codes[rng.integers(0, 4, size=codes.size)]
    codes = np.where(snp, codes | other, codes).astype(np.uint8)
    # through fasta2ref so the index carries the IUPAC reverse complement
    # (io.c:190-321) — searches run on the read's RC against fwd+RC
    from bwbble_tpu.formats.fasta import fasta2ref
    mask_to_char = {1: "T", 2: "G", 4: "C", 8: "A", 3: "K", 5: "Y",
                    6: "S", 9: "W", 10: "R", 12: "M", 7: "B", 11: "D",
                    13: "H", 14: "V", 15: "N"}
    fa = tmp_path / "w.fa"
    fa.write_text(">c\n" + "".join(mask_to_char[int(m)] for m in codes)
                  + "\n")
    out_codes, _ = fasta2ref(str(fa), str(tmp_path / "w.ref"),
                             str(tmp_path / "w.ann"))
    idx = FMIndex.build(out_codes)
    didx = DI.from_fmindex(idx)

    L = 48
    nt4 = {0: "A", 1: "C", 2: "G", 3: "T"}
    reads = []
    for r in range(32):
        s = int(rng.integers(0, base.size - L))
        frag = [nt4[int(x)] for x in base[s:s + L]]
        for _ in range(int(rng.integers(0, 3))):
            frag[int(rng.integers(0, L))] = nt4[int(rng.integers(0, 4))]
        reads.append("".join(frag))
    fq = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                 for i, s in enumerate(reads))
    rd = parse_fastq_bytes(fq.encode())

    params = AlnParams(max_diff=3, batch_size=128)
    base_cfg = EngineConfig(cap=131072, acap=24, kx=2, max_iters=60_000)

    # EXACT D bounds via the native unbounded-list scanner: the device
    # K-capped D pass overflows wholesale on this IUPAC density (the
    # pipeline escalates exactly like this; a clipped D over-prunes)
    from bwbble_tpu.engine.pipeline import native_scan_chunks
    B = 128
    Lmax = rd.max_len
    D_np = np.zeros((B, Lmax + 1, 2), dtype=np.int32)
    Ds_np = np.zeros((B, int(params.seed_length) + 1, 2), dtype=np.int32)
    for gi, Dch, Dsch, _zc in native_scan_chunks(idx, rd, params, B):
        D_np[gi[0]:gi[-1] + 1] = Dch
        Ds_np[gi[0]:gi[-1] + 1] = Dsch
    D_np[rd.count:] = D_np[0]
    Ds_np[rd.count:] = Ds_np[0]

    def _run_exact_d(cfg_):
        rc = np.zeros((B, Lmax), dtype=np.int8)
        rc[:rd.count] = rd.rc
        rc[rd.count:] = rd.rc[0]
        lengths = np.full(B, rd.lengths[0], dtype=np.int32)
        lengths[:rd.count] = rd.lengths
        res = inexact_search(didx, jnp.asarray(rc), jnp.asarray(lengths),
                             jnp.asarray(D_np), jnp.asarray(Ds_np),
                             params, cfg_)
        return {k: np.asarray(v) for k, v in res.items()}

    # legacy kx path must overflow on some reads here (the scenario)
    ref = _run_exact_d(dataclasses.replace(base_cfg, backend="xla"))
    assert ref["overflow"][:rd.count].sum() > 0, \
        "world too easy: legacy kx path did not overflow"

    PK.INTERPRET = True
    try:
        got = _run_exact_d(dataclasses.replace(base_cfg, backend="resident",
                                               xcap=128))
    finally:
        PK.INTERPRET = False
    assert got["overflow"][:rd.count].sum() == 0, \
        f"resident xcap still overflowed {got['overflow'][:rd.count].sum()}"

    # alignment-for-alignment parity vs the gold engine, paths included
    lanes_l, nodes_l = [], []
    for b in range(rd.count):
        for k in range(int(got["n_alns"][b])):
            lanes_l.append(b)
            nodes_l.append(int(got["o_node"][b, k]))
    paths = {}
    if lanes_l:
        W = max(256, len(lanes_l))
        lanes_a = np.zeros(W, dtype=np.int32)
        nodes_a = np.full(W, -1, dtype=np.int32)
        lanes_a[:len(lanes_l)] = lanes_l
        nodes_a[:len(nodes_l)] = nodes_l
        pr = np.asarray(walk_paths(got["arena"], jnp.asarray(lanes_a),
                                   jnp.asarray(nodes_a), nroot=1,
                                   nslot=23, nc=11,
                                   pathcap=rd.max_len + 32))
        for w, (b, _n) in enumerate(zip(lanes_l, nodes_l)):
            paths.setdefault(b, []).append(pr[w])

    n_exercised = 0
    for b in range(rd.count):
        gold = align_read_gold(idx, rd.seq[b], rd.rc[b],
                               int(rd.lengths[b]), params)
        assert int(got["n_alns"][b]) == len(gold), f"read {b} count"
        if ref["overflow"][b] and len(gold):
            n_exercised += 1
        for k, ga in enumerate(gold):
            assert int(got["o_L"][b, k]) == ga.L, f"read {b} aln {k} L"
            assert int(got["o_U"][b, k]) == ga.U
            assert int(got["o_score"][b, k]) == ga.score
            assert int(got["o_mm"][b, k]) == ga.num_mm
            assert int(got["o_go"][b, k]) == ga.num_gapo
            assert int(got["o_ge"][b, k]) == ga.num_gape
            assert int(got["o_snp"][b, k]) & 0xFF == ga.num_snps
            assert int(got["o_len"][b, k]) == ga.aln_length
            path = _reconstruct_path(paths[b][k],
                                     int(got["o_plen"][b, k]),
                                     int(got["o_len"][b, k]), 0)
            assert path == ga.path, f"read {b} aln {k} path"
    assert n_exercised > 0, "no read exercised the wide-list path"


def test_kernel_queued_matches_xla_body(world):
    """Queue mode (ring arena + flush/refill + flush-time path walks)
    through the Pallas kernel must reproduce the XLA queue loop exactly."""
    from bwbble_tpu.engine.inexact import inexact_search_queued
    idx, didx, reads = world
    params = AlnParams(max_diff=3, batch_size=128)
    cfg = EngineConfig(cap=4096, acap=24, kx=4, max_iters=20_000,
                       flush=16, backend="xla")
    # tile the read set so 384 reads stream through 128 lanes: exercises
    # mid-run refills, ring wraps, and flush-time walks in the kernel path
    rc = np.tile(np.asarray(reads.rc, dtype=np.int8), (8, 1))
    lengths = np.tile(reads.lengths.astype(np.int32), 8)
    D, Ds, _ = _calc_d_chunk(didx, jnp.asarray(rc), jnp.asarray(lengths),
                             lengths, params, K=16)

    def run(cfg_):
        res = inexact_search_queued(
            didx, jnp.asarray(rc), jnp.asarray(lengths), D, Ds,
            params, cfg_, lanes=128)
        return {k: np.asarray(v) for k, v in res.items()}

    ref = run(cfg)
    PK.INTERPRET = True
    try:
        got = run(dataclasses.replace(cfg, backend="pallas"))
        got_res = run(dataclasses.replace(cfg, backend="resident"))
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "paths", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)
        # ring-queue resident mode (segments + XLA switch_step): same
        # reads through the same flush/refill semantics, bit-identical
        np.testing.assert_array_equal(ref[k], got_res[k],
                                      err_msg="resident " + k)


def test_kernel_queued_resident_xcap_defer(world):
    """The production chr21 ring config: resident queued with chunked
    exact completion (xcap) + deferred DFS-resume.  The xcap path handles
    completion lists the XLA body's kx slots overflow on, and deferral
    shifts WHICH wave a lane pops by <= 1 — so per-read results are
    checked against the GOLD engine (like the fixed-mode xcap test), plus
    the overflow set must be a subset of the XLA body's."""
    from bwbble_tpu.align.pipeline import align_read_gold
    from bwbble_tpu.engine.inexact import inexact_search_queued
    from bwbble_tpu.engine.pipeline import (_reconstruct_path,
                                            native_scan_chunks)
    idx, didx, reads = world
    params = AlnParams(max_diff=3, batch_size=128)
    cfg = EngineConfig(cap=4096, acap=24, kx=2, max_iters=20_000,
                       flush=16, backend="xla")
    rc = np.tile(np.asarray(reads.rc, dtype=np.int8), (8, 1))
    lengths = np.tile(reads.lengths.astype(np.int32), 8)
    # EXACT D bounds (native unbounded-list scanner): the gold comparison
    # below needs them — a K-clipped device D pass over-prunes on this
    # dense world and every engine would legitimately diverge from gold
    Lmax = reads.max_len
    D1 = np.zeros((reads.count, Lmax + 1, 2), dtype=np.int32)
    Ds1 = np.zeros((reads.count, int(params.seed_length) + 1, 2),
                   dtype=np.int32)
    for gi, Dch, Dsch, _zc in native_scan_chunks(idx, reads, params,
                                                 reads.count):
        D1[gi[0]:gi[-1] + 1] = Dch
        Ds1[gi[0]:gi[-1] + 1] = Dsch
    D = jnp.asarray(np.tile(D1, (8, 1, 1)))
    Ds = jnp.asarray(np.tile(Ds1, (8, 1, 1)))

    def run(cfg_):
        res = inexact_search_queued(
            didx, jnp.asarray(rc), jnp.asarray(lengths), D, Ds,
            params, cfg_, lanes=128)
        return {k: np.asarray(v) for k, v in res.items()}

    ref = run(cfg)
    PK.INTERPRET = True
    try:
        got = run(dataclasses.replace(cfg, backend="resident", xcap=64))
    finally:
        PK.INTERPRET = False

    # xcap strictly extends coverage: anything the resident path flags
    # must also overflow the kx-limited XLA body
    assert not np.any(got["overflow"] & ~ref["overflow"])
    from bwbble_tpu.engine.inexact import unpack_paths
    up_paths = unpack_paths(got["paths"], Lmax + 32)
    n_widened = 0
    for b in range(reads.count):      # distinct reads (tiles repeat them)
        if got["overflow"][b]:
            continue
        gold = align_read_gold(idx, reads.seq[b], reads.rc[b],
                               int(reads.lengths[b]), params)
        if ref["overflow"][b]:
            n_widened += 1            # read the XLA kx path could not do
        assert int(got["n_alns"][b]) == len(gold), f"read {b} count"
        for k, ga in enumerate(gold):
            assert int(got["o_L"][b, k]) == ga.L, f"read {b} aln {k}"
            assert int(got["o_U"][b, k]) == ga.U
            assert int(got["o_score"][b, k]) == ga.score
            assert int(got["o_mm"][b, k]) == ga.num_mm
            assert int(got["o_go"][b, k]) == ga.num_gapo
            assert int(got["o_ge"][b, k]) == ga.num_gape
            assert int(got["o_len"][b, k]) == ga.aln_length
            path = _reconstruct_path(up_paths[b][k],
                                     int(got["o_plen"][b, k]),
                                     int(got["o_len"][b, k]), 0)
            assert path == ga.path, f"read {b} aln {k} path"
    assert n_widened > 0, "no read exercised the xcap-beyond-kx path"


def test_kernel_queued_resident_all_discarded(world):
    """Drain-deadlock regression (ADVICE r3, kernel.py): a segment that
    starts with zero alive lanes but finished-unflushed lanes (here: refill
    batches entirely discarded on init — all-N reads get MODE_DONE before
    the kernel ever runs) used to run zero waves, leave _SC_DOSW=0, and
    never reach switch_wrap — the outer while_loop carry was a fixed point
    and the device spun forever.  The forced switch on alive==0 must
    terminate the loop with results identical to the XLA queue body."""
    from bwbble_tpu.engine.inexact import inexact_search_queued
    idx, didx, reads = world
    params = AlnParams(max_diff=3, batch_size=128)
    cfg = EngineConfig(cap=4096, acap=24, kx=4, max_iters=20_000,
                       flush=16, backend="xla")
    Lmax = reads.max_len
    NR = 384
    rc = np.full((NR, Lmax), 4, dtype=np.int8)   # all-N: discarded on init
    # two real reads so some segments interleave live work with the
    # entirely-dead refills
    rc[0] = np.asarray(reads.rc[0], dtype=np.int8)
    rc[97] = np.asarray(reads.rc[1], dtype=np.int8)
    lengths = np.full(NR, reads.lengths[0], dtype=np.int32)
    lengths[0] = int(reads.lengths[0])
    lengths[97] = int(reads.lengths[1])
    D, Ds, _ = _calc_d_chunk(didx, jnp.asarray(rc), jnp.asarray(lengths),
                             lengths, params, K=16)

    def run(cfg_):
        res = inexact_search_queued(
            didx, jnp.asarray(rc), jnp.asarray(lengths), D, Ds,
            params, cfg_, lanes=128)
        return {k: np.asarray(v) for k, v in res.items()}

    ref = run(cfg)
    PK.INTERPRET = True
    try:
        got_res = run(dataclasses.replace(cfg, backend="resident"))
    finally:
        PK.INTERPRET = False
    for k in ("n_alns", "o_L", "o_U", "o_score", "overflow", "paths"):
        np.testing.assert_array_equal(ref[k], got_res[k], err_msg=k)
