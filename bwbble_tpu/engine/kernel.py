"""Pallas TPU mega-kernel for the inexact-search loop body.

Motivation (measured, STATUS.md round-2 perf model): the XLA loop body
lowers to ~100 small fusions, and at the narrow lane counts the chr21
workload forces (frame memory caps lanes at 64-1024 for deep reads) the
per-iteration cost is pure dispatch overhead — ~0.10 ms at B=128 and
~0.5 ms at B=1024, i.e. 0.5-0.8 us per lane-iteration, slower than the
single-core C reference's ~0.4 us/pop (inexact_match.c:256-506).  This
module fuses the ENTIRE iteration body — exact-completion step, DFS pop
accounting, rank math, pruning, candidate construction, score-bucket
linking, and alignment emission — into ONE Pallas kernel over VMEM-resident
per-lane state, leaving only the latency-bound HBM row gathers (arena pop
row + fused rank-table rows, both already ~0.3-2 ns/row on XLA's gather
path), a few index/pick fusions, and the frame write in XLA glue.
Dispatches per iteration: ~100 -> ~12.

Layout: everything the kernel touches is LANE-MAJOR ([X, B] with the lane
axis last) so per-lane scalars are (1, B) row vectors across the VPU's
128 lanes; the gathered rank rows are transposed to [RQ*32, B] by one XLA
transpose per iteration (~1.3 MB).  Sublane-major ([B, X]) layouts put
per-lane scalars into (B, 1) columns that occupy one VPU lane — a 16x
vector-op penalty.

Bit-exactness: every computation mirrors engine/inexact.py's XLA body
(itself parity-tested byte-for-byte against the compiled reference) with
identical integer formulas and masked-select structure; the kernel is pure
int32 arithmetic, so results are identical.  tests/test_kernel.py asserts
equality of the result dict against the XLA body on the same inputs.

Dispatch matrix (engine/inexact.py:_search, EngineConfig.backend):
- resident kernel (run_loop_resident / run_loop_resident_queued): int32,
  B a multiple of 128, xsteps == 1, no tp sharding, NROOT == 1 — covers
  multiref AND single-genome (-S) in fixed-batch and ring-queue modes;
  chunked exact completion (cfg.xcap) handles interval lists up to XCAP.
- per-iteration kernel (run_loop): same constraints but also NROOT > 1
  (precalc -P seeds) via the rtN root rows.
- XLA body: everything else — int64 indices, xsteps > 1, tp-sharded
  index (rank psum over the mesh axis), non-128-multiple lane counts.
Under a dp-only mesh (tp == 1) the Pallas kernels run per shard inside
shard_map (parallel/shard.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bwbble_tpu import constants as C
from bwbble_tpu.engine.device_index import BLK

# set True in tests to run the kernel through the Pallas interpreter on CPU
INTERPRET = False

# Rank-table rows reach the kernel as gathered 512-byte "fat rows" (4
# consecutive 32-word blocks viewed as one [.., 128] row) and are
# transposed + sub-slab-selected IN the kernel.  A gather whose output
# minor dim is exactly the 128-lane tile keeps XLA's natural row-major
# gather layout (bulk row copies); the old [RQ*32, B] lane-major feed let
# XLA fold the transpose INTO the gather as scattered 4-byte stores
# (~9-60 ns/row, 57% of the iteration — see STATUS.md and
# benchmarks/gather_pallas_probe.py).  False restores the old feed.
FAT_ROWS = True
# Blocks per fat row (4 -> 512-B rows, 8 -> 1-KB super-rows).  The gather
# engine is LATENCY-bound per row (~12 ns/row regardless of 128-512 B row
# size, measured in-loop), so wider rows cost the same and let narrow
# (L, U) query pairs share one fetched row.
FAT_BLOCKS = int(__import__("os").environ.get("BWBBLE_FAT_BLOCKS", "4"))

MODE_DFS, MODE_EXACT, MODE_DONE, MODE_EMIT = 0, 1, 2, 3
_SH_MM, _SH_GO, _SH_GE, _SH_ST, _SH_PLEN = 8, 13, 16, 20, 22

# sv row layout ([NSV, B] plane): per-lane scalar state
(_SV_MODE, _SV_BEST, _SV_MAXD, _SV_NBEST, _SV_NALN, _SV_OVER, _SV_NOPEN,
 _SV_NPUSH, _SV_XCNT, _SV_XJ, _SV_XNODE, _SV_XM1, _SV_XM2,
 _SV_POPPED, _SV_NWORK, _SV_OVWHY,
 _SV_XRD, _SV_XWR, _SV_XPAR, _SV_XTU, _SV_XEMIT, _SV_PF) = range(22)
NSV = 24

def _pad8(n):
    return ((int(n) + 7) // 8) * 8

_MATCH = np.asarray(C.MATCH_MATRIX, dtype=np.int32)      # [5, 16]
_IS_SNP = np.asarray(C.IS_SNP, dtype=np.int32)
_NUCL = np.asarray(C.NUCL_BASES, dtype=np.int32)         # [4, 7]
_NB_PER = C.BASES_PER_NUCLEOTIDE                          # 7
_SKIP = set(int(j) for j in C.SKIPPED_ORDERS)


def _pack1(i, mm, go, ge, st, plen):
    return (i | (mm << _SH_MM) | (go << _SH_GO) | (ge << _SH_GE)
            | (st << _SH_ST) | (plen << _SH_PLEN))


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _shift_rows(x, k, fill):
    """x shifted down by k along axis 0 (static k), fill on top.  Bool
    arrays shift through int32 (Mosaic cannot concatenate i1 vectors)."""
    if x.dtype == jnp.bool_:
        return _shift_rows(x.astype(jnp.int32), k, int(bool(fill))) != 0
    M = x.shape[0]
    if k >= M:
        return jnp.full_like(x, fill)
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:M - k]], axis=0)


class _Static:
    """Compile-time constants shared by the kernel and its glue."""

    def __init__(self, params, cfg, B, Lmax, NROOT):
        self.B = B
        self.Lmax = Lmax
        self.NROOT = NROOT
        self.p_mm = int(params.mm_score)
        self.p_go = int(params.gapo_score)
        self.p_ge = int(params.gape_score)
        self.p_maxdiff = int(params.max_diff)
        self.p_maxgapo = int(params.max_gapo)
        self.p_maxgape = int(params.max_gape)
        self.p_seedlen = int(params.seed_length)
        self.p_maxdiffseed = int(params.max_diff_seed)
        self.p_maxbest = int(params.max_best)
        self.p_noindel = int(params.no_indel_length)
        self.p_maxentries = int(params.max_entries)
        # multiref: the 11 non-skipped IUPAC codes; single-genome (-S):
        # the Gray codes of A,G,C,T — the rank-slab columns line up so the
        # expansion loop, snp counting (_IS_SNP[pure base] == 0) and the
        # exact-completion candidate pick are shared (engine/inexact.py
        # chars/jj mapping; rank_actg_dfs is a column projection of the
        # exact-variant rank, engine/rank.py:142-149)
        self.multiref = bool(params.is_multiref)
        if self.multiref:
            self.chars = tuple(j for j in range(1, 16) if j not in _SKIP)
        else:
            self.chars = tuple(int(x) for x in C.NT4_GRAY[:4])
        self.NC = len(self.chars)
        self.NSLOT = 1 + 2 * self.NC
        self.ACAP = int(cfg.acap)
        self.KX = int(cfg.kx)
        # chunked exact completion (resident kernel): interval-list
        # capacity XCAP with KX slots expanded per wave; 0 = the legacy
        # KX-slot whole-list-per-wave path.  Measured on the chr21 world
        # the completion lists are bimodal: 66% of reads stay <= 2, the
        # rest jump to ~64-86 and NEVER exceed 256 (benchmarks/
        # tail_survey.py + the native-gold xlist probe), so XCAP=128
        # makes the device own every read the round-2 engine shipped to
        # the host for kx overflow.
        self.XCAP = int(getattr(cfg, "xcap", 0))
        self.EXITA = int(getattr(cfg, "exit_alive", 0))
        # deferred DFS-resume (a lane finishing its exact scan / emission
        # pops next wave — a pure per-lane delay, output-identical): lets
        # the resident kernel know at wave start exactly which lanes pop,
        # so the pop + DFS rank streams can be skipped on waves with no
        # popping lane.  Enabled for the xcap path by run_loop_resident.
        self.DEFER = False
        # overlapped frame write (wait at next wave start): toggled for
        # measurement via BWBBLE_WR_OVERLAP
        self.WROVL = bool(int(
            __import__("os").environ.get("BWBBLE_WR_OVERLAP", "1")))
        self.EC = int(__import__("os").environ.get("BWBBLE_EC", "8"))
        self.CAP = int(cfg.cap)
        self.NFRAME = (self.CAP - NROOT) // self.NSLOT - 1
        self.ROWW = 128
        self.PATHCAP = int(cfg.pathcap) or (Lmax + 32)
        self.NB = ((self.p_maxdiff + 1) * self.p_mm
                   + (self.p_maxgapo + 1) * self.p_go
                   + (self.p_maxgape + 1) * self.p_ge)
        self.worst = self.NB
        # queue mode: per-lane ring arena — node ids come from the lane's
        # own pop clock (sv row _SV_PF), lane b's pushes land at slot
        # pf[b] % NFRAME of its own column, and a read overflows once it
        # has made NFRAME pops (age = pf - start_f, per-read exact;
        # exact-completion waves cost no budget)
        self.RING = False
        # rank-row stream order: [L_dfs, U_dfs, xL_0..xL_{KX-1}, xU_0..]
        self.RQ = 2 + 2 * self.KX
        self.W = 32          # fused table row width (int32 words)
        self.FAT = FAT_ROWS  # fat-row gather + in-kernel slab pick
        self.FATB = FAT_BLOCKS   # table blocks (32 words) per fat row
        self.FATW = 32 * self.FATB             # fat row width, int32 words
        self.SUBW = _pad8(self.RQ)             # sub-slab row, sublane-padded
        # per-read lane-major lookup tables resident as kernel inputs
        # (the XLA-glue one-hot picks over [B, L, 2] D bounds lowered to a
        # kLoop fusion measured at 142 us/iter — 80% of the iteration):
        #   rcx [RCW, B]: read chars; row Lmax holds the read length
        #   dnw [2*HD, B]: D next-diff rows 0..TD, widths at HD..HD+TD
        #   dsw [2*HS, B]: seed-D likewise
        self.TD = Lmax                  # D has Lmax+1 rows per read
        self.TS = max(self.p_seedlen, 1)
        self.RCW = _pad8(Lmax + 1)
        self.HD = _pad8(self.TD + 1)
        self.HS = _pad8(self.TS + 1)
        # nxt feed-forward rows: node_next + 2*KX exact rank-row ids +
        # 2*KX exact slot VALUES (the (L-1, U) rank queries of the next
        # wave's exact streams, carried so the exact step reads them
        # instead of re-picking [XCAP, B] planes) + 1 per-lane exact
        # fetch-mask row (bit q = exact stream q's fat row must be DMAd:
        # live slot AND not a duplicate of an earlier stream's fat row) +
        # the fresh-pop forward (1 flag row + the 4 node words of a
        # next-pop node minted THIS wave — the LIFO-descent common case —
        # so the resident kernel skips its arena pop DMA), sublane-padded
        self.XMROW = 1 + 4 * self.KX if self.XCAP > 0 else 1 + 2 * self.KX
        self.FRROW = self.XMROW + 1            # fresh flag; +1..+4 words
        self.NXW = _pad8(self.FRROW + 5)

    def score_of(self, mm, go, ge):
        return mm * self.p_mm + go * self.p_go + ge * self.p_ge


# --------------------------------------------------------------------------
# kernel internals (all arrays lane-major: trailing dim = lanes)
# --------------------------------------------------------------------------

def _j16():
    """[16, 1] code-index slab (Pallas kernels cannot capture array
    constants, so the per-code masks derive from an iota)."""
    return _iota((16, 1), 0)


def _rank16(S: _Static, i, rows, q, inc, dfs, LEN, carr16, carr17):
    """Occurrence bounds for ALL 16 codes at positions i for one query
    stream, as one [16, B0] slab (engine/rank.py:_rank_all; bwt.c:602-734
    semantics incl. the quirk-Q1 skipped-code path when dfs=True).

    The 16-code XNOR-AND trees are evaluated on [16, B0] tiles against
    [16, 1] code-bit constants — ~4x fewer vector ops than per-code rows.

    i: (1, B0) positions; rows: the gathered row ref ([RQ*32, B0]); q:
    static stream index; inc: 0/1 static; carr16/carr17: [16, 1] C-array
    slabs (C[0..15] and C[1..16]).
    """
    len_m1 = LEN - 1
    i_c = jnp.clip(i, 0, jnp.maximum(len_m1 - 1, 0))
    k = i_c // BLK
    off = i_c - k * BLK
    pw = lambda c: rows[q * S.W + c:q * S.W + c + 1, :]        # (1, B0)
    ck16 = rows[q * S.W + 16:q * S.W + 32, :]                  # [16, B0]
    j16 = _j16()
    cnt = None
    for w in range(4):
        nbits = off + 1 - 32 * w
        partial = (jnp.int32(1) << jnp.clip(nbits, 0, 31)) - 1
        mask = jnp.where(nbits >= 32, jnp.int32(-1),
                         jnp.where(nbits <= 0, jnp.int32(0), partial))
        m = None
        for t in range(4):
            word = pw(4 * t + w)                               # (1, B0)
            sel = jnp.where(((j16 >> t) & 1) == 1, word, ~word)
            m = sel if m is None else (m & sel)                # [16, B0]
        pc = jax.lax.population_count(m & mask)
        cnt = pc if cnt is None else (cnt + pc)
    first = ((pw(0) & 1) | ((pw(4) & 1) << 1) | ((pw(8) & 1) << 2)
             | ((pw(12) & 1) << 3))
    fd = (j16 == first).astype(jnp.int32)                      # [16, B0]
    normal = carr16 + ck16 + cnt + inc - fd
    if dfs:
        skip16 = jnp.zeros_like(j16)
        for v in sorted(_SKIP):
            skip16 = skip16 | (j16 == v).astype(jnp.int32)
        normal = jnp.where(skip16 == 1, carr16 + inc - fd, normal)
    low = carr16 + jnp.full_like(fd, inc)
    high = carr17 + jnp.full_like(fd, inc)
    out = jnp.where(i == len_m1, high, jnp.where(i < 0, low, normal))
    return jnp.where(j16 == 0, 0, out)


def _pick_rows(arr, idx, T):
    """arr[idx[b], b] for [T, B0] arr and (1, B0) idx via one-hot sum."""
    rows = _iota(arr.shape, 0)
    return jnp.sum(jnp.where(rows == idx, arr, 0), axis=0, keepdims=True,
                   dtype=arr.dtype)


def _emit(S: _Static, st, lanes, node, m1, m2, Ls, Us, cnt, extra_m):
    """emit_alns of engine/inexact.py (inexact_match.c:331-375 +
    add_alignment's gap dedup, align.c:271-298).  Ls/Us: lists of (1, B0)
    slot-ordered intervals; mutates `st` in place; returns nothing."""
    mm = (m1 >> _SH_MM) & 0x1F
    go = (m1 >> _SH_GO) & 0x7
    ge = (m1 >> _SH_GE) & 0xF
    plen = (m1 >> _SH_PLEN) & 0x1FF
    snp = m2 & 0xFF
    score = S.score_of(mm, go, ge)

    first_hit = lanes & (st["n_alns"] == 0)
    best_diff = mm + go + ge
    new_best = jnp.minimum(best_diff + 1, S.p_maxdiff)
    st["best_score"] = jnp.where(first_hit, score, st["best_score"])
    st["max_diff"] = jnp.where(first_hit, new_best, st["max_diff"])

    width = jnp.zeros_like(node)
    for s in range(len(Ls)):
        width = width + jnp.where(s < cnt, Us[s] - Ls[s] + 1, 0)
    is_best = score == st["best_score"]
    st["num_best"] = st["num_best"] + jnp.where(lanes & is_best, width, 0)
    stop = lanes & ~is_best & (st["num_best"] > S.p_maxbest)

    col_a = _iota((S.ACAP, node.shape[1]), 0)
    add_len = plen + extra_m
    for s in range(len(Ls)):
        Lv, Uv = Ls[s], Us[s]
        ok = lanes & ~stop & (s < cnt)
        dup = jnp.any((st["o_L"] == Lv) & (st["o_U"] == Uv)
                      & (col_a < st["n_alns"]), axis=0, keepdims=True)
        ok = ok & ~(dup & (go > 0))
        full = ok & (st["n_alns"] >= S.ACAP)
        ok = ok & ~full
        st["overflow"] = st["overflow"] | full
        st["ovwhy"] = st["ovwhy"] | jnp.where(full, 2, 0)
        sel = ok & (col_a == st["n_alns"])
        st["o_L"] = jnp.where(sel, Lv, st["o_L"])
        st["o_U"] = jnp.where(sel, Uv, st["o_U"])
        st["o_score"] = jnp.where(sel, score, st["o_score"])
        st["o_len"] = jnp.where(sel, add_len, st["o_len"])
        st["o_node"] = jnp.where(sel, node, st["o_node"])
        st["o_m1"] = jnp.where(sel, m1, st["o_m1"])
        st["o_snp"] = jnp.where(sel, snp, st["o_snp"])
        st["n_alns"] = st["n_alns"] + ok.astype(jnp.int32)
    st["mode"] = jnp.where(stop, jnp.int32(MODE_DONE), st["mode"])


def _merge_compact(S: _Static, candL, candU, valid, K):
    """engine/intervals.py:merge_compact on [M, B0] arrays: carry-last-
    valid-U log-scan, chain-head flags, prefix-sum group ids, one-hot
    chain reductions (add_sa_interval merge semantics, align.c:93-110)."""
    M, B0 = candL.shape
    vU = jnp.where(valid, candU, -2)
    vF = valid
    sh = 1
    while sh < M:
        vU = jnp.where(vF, vU, _shift_rows(vU, sh, -2))
        vF = vF | _shift_rows(vF, sh, False)
        sh <<= 1
    prevU = _shift_rows(vU, 1, -2)
    head = valid & (candL != prevU + 1)
    gs = head.astype(jnp.int32)
    sh = 1
    while sh < M:
        gs = gs + _shift_rows(gs, sh, 0)
        sh <<= 1
    gid = gs - 1
    newcnt = jnp.max(jnp.where(valid, gid + 1, 0), axis=0, keepdims=True)

    g = _iota((K, M, B0), 0)
    is_g = gid[None] == g
    Lmin = jnp.sum(jnp.where(is_g & head[None], candL[None], 0), axis=1,
                   dtype=candL.dtype)                          # [K, B0]
    Umax = jnp.max(jnp.where(is_g & valid[None], candU[None], -1), axis=1)

    overflow = newcnt > K
    newcnt = jnp.minimum(newcnt, K)
    live = _iota((K, B0), 0) < newcnt
    newLs = jnp.where(live, Lmin, 0)
    newUs = jnp.where(live, Umax, -1)
    return newLs, newUs, newcnt, overflow


def _merge_groups_tail(S: _Static, candL, candU, valid, tailU):
    """add_sa_interval semantics (align.c:93-110) for a CHUNK of candidates
    appended to a running list: group adjacent candidates ([M, B0], arrival
    order), seeding adjacency with the list's current tail U.  Returns
    (Lmin [M, B0], Umax [M, B0], G (1, B0) group count, tail_upd (1, B0)
    leading-run-merges-into-tail flag, tailU_new (1, B0))."""
    M, B0 = candL.shape
    vU = jnp.where(valid, candU, -2)
    vF = valid
    sh = 1
    while sh < M:
        vU = jnp.where(vF, vU, _shift_rows(vU, sh, -2))
        vF = vF | _shift_rows(vF, sh, False)
        sh <<= 1
    prevF = _shift_rows(vF, 1, False)
    prevU = jnp.where(prevF, _shift_rows(vU, 1, -2), tailU)
    head = valid & (candL != prevU + 1)
    gs = head.astype(jnp.int32)
    sh = 1
    while sh < M:
        gs = gs + _shift_rows(gs, sh, 0)
        sh <<= 1
    gid = gs - 1                                  # -1: merges into the tail
    G = jnp.max(jnp.where(valid, gid + 1, 0), axis=0, keepdims=True)
    g = _iota((M, M, B0), 0)
    is_g = gid[None] == g
    Lmin = jnp.sum(jnp.where(is_g & head[None], candL[None], 0), axis=1,
                   dtype=candL.dtype)                          # [M, B0]
    Umax = jnp.max(jnp.where(is_g & valid[None], candU[None], -1), axis=1)
    in_tail = valid & (gid == -1)
    tail_upd = jnp.any(in_tail, axis=0, keepdims=True)
    tailU_new = jnp.max(jnp.where(in_tail, candU, -2), axis=0, keepdims=True)
    return Lmin, Umax, G, tail_upd, tailU_new


def _exact_cands(S: _Static, occL, occU, c):
    """The candidate (L, U) slabs for a read base from 16-code rank slabs
    via a 4-way select on c: the 7 nucl_bases rows (multiref), or the one
    exact Gray-code row (single-genome, exact_match_1to1_bounded — the
    rank-slab column already carries C + occ + inc, so this equals the
    rank1_pair path of the XLA body, bwt.c:348-372 sans the sentinel case
    which needs c == 0 and never arises for pure bases)."""
    Lb, Ub = [], []
    for base in range(4):
        syms = ([int(x) for x in _NUCL[base]] if S.multiref
                else [int(C.NT4_GRAY[base])])
        Lb.append(jnp.concatenate([occL[x:x + 1, :] for x in syms], axis=0))
        Ub.append(jnp.concatenate([occU[x:x + 1, :] for x in syms], axis=0))
    cl = jnp.where(c == 0, Lb[0], jnp.where(c == 1, Lb[1],
                   jnp.where(c == 2, Lb[2], Lb[3])))            # [7, B0]
    cu = jnp.where(c == 0, Ub[0], jnp.where(c == 1, Ub[1],
                   jnp.where(c == 2, Ub[2], Ub[3])))
    return cl, cu


def _fat_pick(S: _Static, fat, sub):
    """[RQ, B0, FATW] gathered fat rows + (SUBW, B0) sub-slab ids ->
    lane-major [RQ*32, B0] row stream (transpose + 32-word slab select
    in VMEM)."""
    slabs = []
    for q in range(S.RQ):
        xt = fat[q].T                                     # [FATW, B0]
        sq = sub[q:q + 1, :]                              # (1, B0)
        slab = xt[0:32]
        for v in range(1, S.FATB):
            slab = jnp.where(sq == v, xt[32 * v:32 * (v + 1)], slab)
        slabs.append(slab)
    return jnp.concatenate(slabs, axis=0)                 # [RQ*32, B0]


def _kernel_body(S: _Static, *refs):
    if S.FAT:
        (scal_ref, carr_ref, fat_ref, sub_ref, node4_ref, rcx_ref,
         dnw_ref, dsw_ref, head_ref, sv_ref, oa_ref, xa_ref,
         head_o, sv_o, oa_o, xa_o, cnd_o, nxt_o) = refs
    else:
        (scal_ref, carr_ref, rows_ref, node4_ref, rcx_ref,
         dnw_ref, dsw_ref, head_ref, sv_ref, oa_ref, xa_ref,
         head_o, sv_o, oa_o, xa_o, cnd_o, nxt_o) = refs
    fcnt = scal_ref[0, 0]
    LEN = scal_ref[0, 1]
    if S.FAT:
        # fat_ref[q]: [B0, 128] gathered 512-byte rows (4 consecutive
        # 32-word table blocks); transpose in VMEM and pick each lane's
        # 32-word sub-slab — the HBM gather stays on XLA's bulk row-copy
        # path instead of the folded-transpose scattered-store path
        rows = _fat_pick(S, fat_ref[:], sub_ref[:])
    else:
        rows = rows_ref[:]
    head_n, sv_n, oa_n, xa_n, cnd, nxt = _iter_math(
        S, fcnt, LEN, carr_ref[:], rows, node4_ref[:], rcx_ref[:],
        dnw_ref[:], dsw_ref[:], head_ref[:], sv_ref[:], oa_ref[:],
        xa_ref[:])
    head_o[:] = head_n
    sv_o[:] = sv_n
    oa_o[:] = oa_n
    xa_o[:] = xa_n
    cnd_o[:] = cnd
    nxt_o[:] = nxt


def _iter_math(S: _Static, fcnt, LEN, carr, rows, node4, rcx_t, dnw_t,
               dsw_t, head, sv_t, oa_t, xa_t, xzp=None, xv=None):
    """One search iteration (exact-completion step + DFS pop/prune/expand/
    link/emit) on lane-major VALUE planes — the pure compute core shared by
    the per-iteration kernel (_kernel_body) and the resident multi-pop
    kernel (_resident_body).  Returns (head, sv, oa, xa, cnd, nxt) planes.

    carr: [32, 1] C-array slab; rows: [RQ*32, B0] gathered rank rows in
    stream order; node4: [4, B0] popped-node words."""
    B0 = head.shape[1]
    carr16 = carr[0:16, :]                      # [16, 1]: C[0..15]
    carr17 = carr[1:17, :]                      # [16, 1]: C[1..16]

    eL = node4[0:1, :]
    eU = node4[1:2, :]
    m1 = node4[2:3, :]
    m2 = node4[3:4, :]

    # per-lane picks from the lane-major per-read tables (read chars, D /
    # seed-D bounds, lengths) — one-hot sums over sublane rows in VMEM
    ei0 = m1 & 0xFF
    lengths = rcx_t[S.Lmax:S.Lmax + 1, :]
    rcx = rcx_t
    c_dfs = jnp.clip(_pick_rows(rcx, jnp.clip(ei0 - 1, 0, S.Lmax - 1),
                                S.RCW), 0, 4)
    xj0 = sv_t[_SV_XJ:_SV_XJ + 1, :]
    c_xp = _pick_rows(rcx, jnp.clip(xj0, 0, S.Lmax - 1), S.RCW)
    dn_s = dnw_t[0:S.HD, :]
    dw_s = dnw_t[S.HD:2 * S.HD, :]
    D1n = _pick_rows(dn_s, jnp.clip(ei0 - 1, 0, S.TD), S.HD)
    D2n = _pick_rows(dn_s, jnp.clip(ei0 - 2, 0, S.TD), S.HD)
    D1w = _pick_rows(dw_s, jnp.clip(ei0 - 1, 0, S.TD), S.HD)
    D2w = _pick_rows(dw_s, jnp.clip(ei0 - 2, 0, S.TD), S.HD)
    seed_pos = ei0 - (lengths - S.p_seedlen)
    sn_s = dsw_t[0:S.HS, :]
    sw_s = dsw_t[S.HS:2 * S.HS, :]
    S1n = _pick_rows(sn_s, jnp.clip(seed_pos - 1, 0, S.TS), S.HS)
    S2n = _pick_rows(sn_s, jnp.clip(seed_pos - 2, 0, S.TS), S.HS)
    S1w = _pick_rows(sw_s, jnp.clip(seed_pos - 1, 0, S.TS), S.HS)
    S2w = _pick_rows(sw_s, jnp.clip(seed_pos - 2, 0, S.TS), S.HS)

    sv = lambda k: sv_t[k:k + 1, :]
    st = dict(
        mode=sv(_SV_MODE), best_score=sv(_SV_BEST), max_diff=sv(_SV_MAXD),
        num_best=sv(_SV_NBEST), n_alns=sv(_SV_NALN),
        overflow=sv(_SV_OVER) != 0, n_open=sv(_SV_NOPEN),
        n_pushed=sv(_SV_NPUSH), x_cnt=sv(_SV_XCNT), x_j=sv(_SV_XJ),
        x_node=sv(_SV_XNODE), x_m1=sv(_SV_XM1), x_m2=sv(_SV_XM2),
        o_L=oa_t[0 * S.ACAP:1 * S.ACAP, :],
        o_U=oa_t[1 * S.ACAP:2 * S.ACAP, :],
        o_score=oa_t[2 * S.ACAP:3 * S.ACAP, :],
        o_len=oa_t[3 * S.ACAP:4 * S.ACAP, :],
        o_node=oa_t[4 * S.ACAP:5 * S.ACAP, :],
        o_m1=oa_t[5 * S.ACAP:6 * S.ACAP, :],
        o_snp=oa_t[6 * S.ACAP:7 * S.ACAP, :],
        x_L=xa_t[:S.KX, :], x_U=xa_t[S.KX:, :],
        n_work=sv(_SV_NWORK), ovwhy=sv(_SV_OVWHY),
        x_rd=sv(_SV_XRD), x_wr=sv(_SV_XWR), x_par=sv(_SV_XPAR),
        x_tU=sv(_SV_XTU), x_emit=sv(_SV_XEMIT),
    )

    # ---------------- exact-completion step (engine/inexact.py:exact_step)
    lanesx = st["mode"] == MODE_EXACT
    j = st["x_j"]
    c = jnp.where(lanesx & (j >= 0), c_xp, 4)
    c_lt4 = c < 4
    if xzp is None:
        candL_l, candU_l, valid_l = [], [], []
        for k in range(S.KX):
            xL = st["x_L"][k:k + 1, :]
            xU = st["x_U"][k:k + 1, :]
            occL = _rank16(S, xL - 1, rows, 2 + k, 1, False, LEN,
                           carr16, carr17)
            occU = _rank16(S, xU, rows, 2 + S.KX + k, 0, False, LEN,
                           carr16, carr17)
            k_live = k < st["x_cnt"]
            cl, cu = _exact_cands(S, occL, occU, c)
            candL_l.append(cl)
            candU_l.append(cu)
            valid_l.append((k_live & (cl <= cu) & c_lt4).astype(jnp.int32))
        candLx = jnp.concatenate(candL_l, axis=0)     # [KX*7, B0]
        candUx = jnp.concatenate(candU_l, axis=0)
        validx = jnp.concatenate(valid_l, axis=0) != 0
        nLs, nUs, ncnt, ovx = _merge_compact(S, candLx, candUx, validx, S.KX)

        adv = lanesx
        st["n_work"] = st["n_work"] + adv.astype(jnp.int32)
        st["ovwhy"] = st["ovwhy"] | jnp.where(adv & ovx, 1, 0)
        nLs = jnp.where(adv, nLs, st["x_L"])
        nUs = jnp.where(adv, nUs, st["x_U"])
        ncnt = jnp.where(adv, ncnt, st["x_cnt"])
        nj = jnp.where(adv, j - 1, j)
        st["overflow"] = st["overflow"] | (adv & ovx)
        st["x_L"], st["x_U"], st["x_cnt"], st["x_j"] = nLs, nUs, ncnt, nj

        finished = adv & ((ncnt == 0) | (nj < 0))
        matched = finished & (ncnt > 0)
        a_i = st["x_m1"] & 0xFF
        _emit(S, st, matched, st["x_node"], st["x_m1"], st["x_m2"],
              [nLs[s:s + 1, :] for s in range(S.KX)],
              [nUs[s:s + 1, :] for s in range(S.KX)],
              jnp.where(matched, ncnt, 0), a_i)
        st["mode"] = jnp.where(finished & (st["mode"] == MODE_EXACT),
                               jnp.int32(MODE_DFS), st["mode"])
        pL0 = pU0 = pL1 = pU1 = None
    else:
        # Chunked completion: the interval list lives in XCAP-row double-
        # buffered planes (cur = parity-selected); each wave expands KX
        # slots of the current char and appends the adjacent-merged groups
        # to the next-char list (exact_match_bounded semantics at ANY list
        # width <= XCAP, exact_match.c:66-119 + add_sa_interval).
        #
        # Wave-cost structure (measured, v5e, B=1024): the [XCAP, B] plane
        # ops here were +38 us/wave over the xcap=0 path, dominated by the
        # statically-unrolled group-append (full-plane materialization per
        # slot) and by plane picks re-deriving values the previous wave
        # already computed.  Three structural fixes, all bit-exact:
        # - the (L-1, U) rank queries of this wave's KX slots arrive as
        #   VALUES carried in the nxt feed-forward rows (`xv`), not picks;
        # - the whole advance block runs under lax.cond(any exact lane) —
        #   every update inside is masked by lanesx, so skipping is exact;
        # - the group append is a dynamic-trip fori_loop over max-groups
        #   (typically 1-3, statically 14).
        pL0, pU0, pL1, pU1 = xzp
        rowsI = _iota((S.XCAP, B0), 0)
        assert xv is not None, "xcap path needs carried exact-slot values"
        qLv_in = xv[:S.KX, :]           # (slot L) - 1 per exact stream
        qUv_in = xv[S.KX:2 * S.KX, :]   # slot U per exact stream

        def _adv(ops):
            (aL0, aU0, aL1, aU1, a_par, a_rd, a_wr, a_tU, a_cnt, a_j,
             a_nw, a_ov, a_why, a_best, a_maxd, a_nbest, a_mode,
             a_emit) = ops
            nxtL = jnp.where(a_par == 0, aL1, aL0)
            nxtU = jnp.where(a_par == 0, aU1, aU0)
            candL_l, candU_l, valid_l = [], [], []
            for k in range(S.KX):
                occL = _rank16(S, qLv_in[k:k + 1, :], rows, 2 + k, 1,
                               False, LEN, carr16, carr17)
                occU = _rank16(S, qUv_in[k:k + 1, :], rows, 2 + S.KX + k,
                               0, False, LEN, carr16, carr17)
                k_live = (a_rd + k) < a_cnt
                cl, cu = _exact_cands(S, occL, occU, c)
                candL_l.append(cl)
                candU_l.append(cu)
                valid_l.append((k_live & (cl <= cu) & c_lt4)
                               .astype(jnp.int32))
            candLx = jnp.concatenate(candL_l, axis=0)     # [KX*7, B0]
            candUx = jnp.concatenate(candU_l, axis=0)
            validx = (jnp.concatenate(valid_l, axis=0) != 0) & lanesx
            grpL, grpU, G, tail_upd, tailU_new = _merge_groups_tail(
                S, candLx, candUx, validx, a_tU)

            adv = lanesx
            a_nw = a_nw + adv.astype(jnp.int32)
            wr = a_wr
            # extend the list tail (leading run adjacent to the previous
            # chunk's last interval), then append the G new groups
            sel_t = adv & tail_upd
            nxtU = jnp.where(sel_t & (rowsI == wr - 1), tailU_new, nxtU)
            M = candLx.shape[0]
            rowm = _iota((M, 1), 0)
            gmax = jnp.max(jnp.where(adv, G, 0))

            def _app(g, c2):
                nL, nU = c2
                Lg = jnp.sum(jnp.where(rowm == g, grpL, 0), axis=0,
                             keepdims=True, dtype=grpL.dtype)
                Ug = jnp.sum(jnp.where(rowm == g, grpU, 0), axis=0,
                             keepdims=True, dtype=grpU.dtype)
                okg = adv & (g < G) & (wr + g < S.XCAP)
                selg = okg & (rowsI == jnp.clip(wr + g, 0, S.XCAP - 1))
                return (jnp.where(selg, Lg, nL), jnp.where(selg, Ug, nU))

            nxtL, nxtU = jax.lax.fori_loop(0, gmax, _app, (nxtL, nxtU))
            new_wr = jnp.where(adv, wr + G, wr)
            lastU = _pick_rows(grpU, jnp.clip(G - 1, 0, M - 1), M)
            new_tU = jnp.where(
                adv, jnp.where(G > 0, lastU,
                               jnp.where(tail_upd, tailU_new, a_tU)),
                a_tU)
            ovx = adv & (new_wr > S.XCAP)
            a_ov = a_ov | ovx.astype(jnp.int32)
            a_why = a_why | jnp.where(ovx, 1, 0)

            new_rd = a_rd + S.KX
            char_done = adv & (new_rd >= a_cnt)
            cnt_c = new_wr                  # list length after this char
            nj = jnp.where(char_done, a_j - 1, a_j)
            n_par = jnp.where(char_done, 1 - a_par, a_par)
            a_rd = jnp.where(char_done, 0, jnp.where(adv, new_rd, a_rd))
            a_wr2 = jnp.where(char_done, 0, new_wr)
            a_tU = jnp.where(char_done, -2, new_tU)
            a_cnt = jnp.where(char_done, cnt_c, a_cnt)

            dead = char_done & (cnt_c == 0)
            fin = char_done & (cnt_c > 0) & (nj < 0)
            # one-shot scoring at scan finish (inexact_match.c:345-362):
            # first-hit best/max_diff update, num_best += total width,
            # stop when suboptimal past max_best — then MODE_EMIT
            xm1 = st["x_m1"]
            xmm = (xm1 >> _SH_MM) & 0x1F
            xgo = (xm1 >> _SH_GO) & 0x7
            xge = (xm1 >> _SH_GE) & 0xF
            score_x = S.score_of(xmm, xgo, xge)
            first_hit = fin & (st["n_alns"] == 0)
            a_best = jnp.where(first_hit, score_x, a_best)
            a_maxd = jnp.where(
                first_hit, jnp.minimum(xmm + xgo + xge + 1, S.p_maxdiff),
                a_maxd)
            width_tot = jnp.sum(
                jnp.where(rowsI < cnt_c, nxtU - nxtL + 1, 0), axis=0,
                keepdims=True, dtype=jnp.int32)
            is_best = score_x == a_best
            stop_x = fin & ~is_best & (a_nbest > S.p_maxbest)
            a_nbest = a_nbest + jnp.where(fin & is_best, width_tot, 0)
            a_mode = jnp.where(
                stop_x, jnp.int32(MODE_DONE),
                jnp.where(fin & ~stop_x, jnp.int32(MODE_EMIT),
                          jnp.where(dead, jnp.int32(MODE_DFS), a_mode)))
            a_emit = jnp.where(fin & ~stop_x, 0, a_emit)
            # write the modified next-list back into the physical planes
            aL0 = jnp.where(a_par == 0, aL0, nxtL)
            aU0 = jnp.where(a_par == 0, aU0, nxtU)
            aL1 = jnp.where(a_par == 0, nxtL, aL1)
            aU1 = jnp.where(a_par == 0, nxtU, aU1)
            return (aL0, aU0, aL1, aU1, n_par, a_rd, a_wr2, a_tU, a_cnt,
                    nj, a_nw, a_ov, a_why, a_best, a_maxd, a_nbest,
                    a_mode, a_emit)

        ops = (pL0, pU0, pL1, pU1, st["x_par"], st["x_rd"], st["x_wr"],
               st["x_tU"], st["x_cnt"], j, st["n_work"],
               st["overflow"].astype(jnp.int32), st["ovwhy"],
               st["best_score"], st["max_diff"], st["num_best"],
               st["mode"], st["x_emit"])
        ops = jax.lax.cond(jnp.any(lanesx), _adv, lambda o: o, ops)
        (pL0, pU0, pL1, pU1, st["x_par"], st["x_rd"], st["x_wr"],
         st["x_tU"], st["x_cnt"], nj, st["n_work"], ovi, st["ovwhy"],
         st["best_score"], st["max_diff"], st["num_best"], st["mode"],
         st["x_emit"]) = ops
        st["overflow"] = ovi != 0
        st["x_j"] = nj

        # ------------- chunked emission (add_alignment, align.c:271-298)
        # rare per wave (a handful of lanes finish a scan at a time), so
        # the EC plane picks run under lax.cond(any emitting lane)
        lanese = st["mode"] == MODE_EMIT

        def _emit_block(eo):
            (oL, oU, oS, oLen, oN, oM1, oSnp, n_al, e_ov, e_why, e_emit,
             e_mode) = eo
            curLe = jnp.where(st["x_par"] == 0, pL0, pL1)
            curUe = jnp.where(st["x_par"] == 0, pU0, pU1)
            xm1 = st["x_m1"]
            xgo = (xm1 >> _SH_GO) & 0x7
            xge = (xm1 >> _SH_GE) & 0xF
            xmm = (xm1 >> _SH_MM) & 0x1F
            score_x = S.score_of(xmm, xgo, xge)
            a_i = xm1 & 0xFF
            add_len = ((xm1 >> _SH_PLEN) & 0x1FF) + a_i
            snp_x = st["x_m2"] & 0xFF
            col_a = _iota((S.ACAP, B0), 0)
            for t in range(S.EC):
                sIdx = e_emit + t
                ok = lanese & (sIdx < st["x_cnt"])
                sc = jnp.clip(sIdx, 0, S.XCAP - 1)
                Lv = _pick_rows(curLe, sc, S.XCAP)
                Uv = _pick_rows(curUe, sc, S.XCAP)
                dup = jnp.any((oL == Lv) & (oU == Uv) & (col_a < n_al),
                              axis=0, keepdims=True)
                ok = ok & ~(dup & (xgo > 0))
                full = ok & (n_al >= S.ACAP)
                ok = ok & ~full
                e_ov = e_ov | full.astype(jnp.int32)
                e_why = e_why | jnp.where(full, 2, 0)
                sel = ok & (col_a == n_al)
                oL = jnp.where(sel, Lv, oL)
                oU = jnp.where(sel, Uv, oU)
                oS = jnp.where(sel, score_x, oS)
                oLen = jnp.where(sel, add_len, oLen)
                oN = jnp.where(sel, st["x_node"], oN)
                oM1 = jnp.where(sel, xm1, oM1)
                oSnp = jnp.where(sel, snp_x, oSnp)
                n_al = n_al + ok.astype(jnp.int32)
            e_emit2 = jnp.where(lanese, e_emit + S.EC, e_emit)
            e_mode = jnp.where(lanese & (e_emit2 >= st["x_cnt"]),
                               jnp.int32(MODE_DFS), e_mode)
            return (oL, oU, oS, oLen, oN, oM1, oSnp, n_al, e_ov, e_why,
                    e_emit2, e_mode)

        eo = (st["o_L"], st["o_U"], st["o_score"], st["o_len"],
              st["o_node"], st["o_m1"], st["o_snp"], st["n_alns"],
              st["overflow"].astype(jnp.int32), st["ovwhy"],
              st["x_emit"], st["mode"])
        eo = jax.lax.cond(jnp.any(lanese), _emit_block, lambda o: o, eo)
        (st["o_L"], st["o_U"], st["o_score"], st["o_len"], st["o_node"],
         st["o_m1"], st["o_snp"], st["n_alns"], eov, st["ovwhy"],
         st["x_emit"], st["mode"]) = eo
        st["overflow"] = eov != 0

    # ------------------------------- DFS step (engine/inexact.py:dfs_step)
    lanes = st["mode"] == MODE_DFS
    if xzp is not None and S.DEFER:
        # deferred resume: a lane that finished its exact scan / emission
        # THIS wave pops next wave instead (pure per-lane delay, output-
        # identical) — so a lane needs either the DFS rank streams or the
        # exact streams, never both, and the resident kernel can skip the
        # unused per-lane DMA issues entirely
        lanes = lanes & (sv_t[_SV_MODE:_SV_MODE + 1, :] == MODE_DFS)
    drained = lanes & (st["n_open"] == 0)
    too_many = lanes & (st["n_open"] > S.p_maxentries)
    st["mode"] = jnp.where(drained | too_many, jnp.int32(MODE_DONE),
                           st["mode"])
    lanes = st["mode"] == MODE_DFS
    if xzp is not None and S.DEFER:
        lanes = lanes & (sv_t[_SV_MODE:_SV_MODE + 1, :] == MODE_DFS)

    row_b = _iota((S.NB, B0), 0)
    occ_b = head >= 0
    bucket = jnp.min(jnp.where(occ_b, row_b, S.NB), axis=0, keepdims=True)
    node = jnp.where(lanes, _pick_rows(head, bucket, S.NB), 0)
    ei = m1 & 0xFF
    emm = (m1 >> _SH_MM) & 0x1F
    ego = (m1 >> _SH_GO) & 0x7
    ege = (m1 >> _SH_GE) & 0xF
    est = (m1 >> _SH_ST) & 0x3
    eplen = (m1 >> _SH_PLEN) & 0x1FF
    esnp = m2 & 0xFF
    prev = ((m2 >> 8) & 0xFFFFFF) - 1        # 24-bit link; mask the sign
    escore = bucket
    head = jnp.where(lanes & (row_b == bucket), prev, head)
    st["n_open"] = st["n_open"] - lanes.astype(jnp.int32)
    st["n_work"] = st["n_work"] + lanes.astype(jnp.int32)

    stop = lanes & (escore > st["best_score"] + S.p_mm)
    st["mode"] = jnp.where(stop, jnp.int32(MODE_DONE), st["mode"])
    lanes = lanes & ~stop

    diff_left = st["max_diff"] - emm - ego - ege
    cont = diff_left < 0
    cont = cont | ((ei > 0) & (diff_left < D1n))
    dls = S.p_maxdiffseed - emm - ego - ege
    cont = cont | ((seed_pos > 0) & (dls < S1n))
    live = lanes & ~cont

    hit = live & (ei == 0)
    _emit(S, st, hit, node, m1, m2, [eL], [eU], hit.astype(jnp.int32),
          jnp.zeros_like(ei))
    live = live & ~hit & (st["mode"] == MODE_DFS)

    to_exact = live & (diff_left == 0)
    st["mode"] = jnp.where(to_exact, jnp.int32(MODE_EXACT), st["mode"])
    st["x_node"] = jnp.where(to_exact, node, st["x_node"])
    st["x_m1"] = jnp.where(to_exact, m1, st["x_m1"])
    st["x_m2"] = jnp.where(to_exact, m2, st["x_m2"])
    st["x_j"] = jnp.where(to_exact, ei - 1, st["x_j"])
    st["x_cnt"] = jnp.where(to_exact, 1, st["x_cnt"])
    if xzp is None:
        xz = _iota((S.KX, B0), 0)
        st["x_L"] = jnp.where(to_exact, jnp.where(xz == 0, eL, 0),
                              st["x_L"])
        st["x_U"] = jnp.where(to_exact, jnp.where(xz == 0, eU, -1),
                              st["x_U"])
    else:
        # seed the chunked scan: list = [(eL, eU)] in plane 0 (the plane
        # writes run under lax.cond(any to_exact lane) — pure row writes
        # stay unconditional, they are cheap)
        st["x_par"] = jnp.where(to_exact, 0, st["x_par"])
        st["x_rd"] = jnp.where(to_exact, 0, st["x_rd"])
        st["x_wr"] = jnp.where(to_exact, 0, st["x_wr"])
        st["x_tU"] = jnp.where(to_exact, -2, st["x_tU"])
        rowsIx = _iota((S.XCAP, B0), 0)

        def _seed(sp):
            sL, sU = sp
            return (jnp.where(to_exact & (rowsIx == 0), eL, sL),
                    jnp.where(to_exact & (rowsIx == 0), eU, sU))

        pL0, pU0 = jax.lax.cond(jnp.any(to_exact), _seed, lambda p: p,
                                (pL0, pU0))
    live = live & ~to_exact

    # expansion ranks (rank_all_dfs_pair on the pre-gathered row pair)
    # expansion ranks: multiref uses the inexact-search variant (Q1 skip
    # semantics); single-genome projects the exact variant (rank_actg)
    Lv = _rank16(S, eL - 1, rows, 0, 1, S.multiref, LEN, carr16, carr17)
    Uv = _rank16(S, eU, rows, 1, 0, S.multiref, LEN, carr16, carr17)

    allow_diff = jnp.ones_like(lanes)
    allow_mm = jnp.ones_like(lanes)
    pm = ei - 1 > 0
    ad1 = diff_left - 1 < D2n
    am1 = (D1n == diff_left - 1) & (D2n == diff_left - 1) & (D1w == D2w)
    allow_diff = allow_diff & ~(pm & ad1)
    allow_mm = allow_mm & ~(pm & ~ad1 & am1)
    ps = seed_pos - 1 > 0
    ad2 = dls - 1 < S2n
    am2 = (S1n == dls - 1) & (S2n == dls - 1) & (S1w == S2w)
    allow_diff = allow_diff & ~(ps & ad2)
    allow_mm = allow_mm & ~(ps & ~ad2 & am2)

    tmp = ego + ege
    allow_indels = ~(((ei - 1) < (S.p_noindel + tmp))
                     | ((lengths - (ei - 1)) < (S.p_noindel + tmp)))
    allow_indels = allow_indels & ~((ego >= S.p_maxgapo)
                                    & (ege >= S.p_maxgape))
    allow_open = ego < S.p_maxgapo
    allow_extend = ege < S.p_maxgape

    cdf = c_dfs
    is_I = est == C.STATE_I
    is_M = est == C.STATE_M
    ind_ok = allow_diff & allow_indels
    nplen = jnp.minimum(eplen + 1, S.PATHCAP - 1)
    path_over = live & (eplen + 1 >= S.PATHCAP)

    candL = [None] * S.NSLOT
    candU = [None] * S.NSLOT
    candM1 = [None] * S.NSLOT
    candM2 = [None] * S.NSLOT
    candSc = [None] * S.NSLOT
    validc = [None] * S.NSLOT
    mm_inc = [None] * S.NSLOT     # mismatch pushes (score +p_mm vs +0)

    ins_ok = ind_ok & ((is_I & allow_extend) | (is_M & allow_open))
    validc[0] = live & ins_ok
    candL[0] = eL
    candU[0] = eU
    go0 = ego + is_M.astype(jnp.int32)
    ge0 = ege + is_I.astype(jnp.int32)
    candM1[0] = _pack1(ei - 1, emm, go0, ge0, C.STATE_I, nplen)
    candSc[0] = S.score_of(emm, go0, ge0)

    for t, jj in enumerate(S.chars):
        Lj, Uj = Lv[jj:jj + 1, :], Uv[jj:jj + 1, :]
        nonempty = Lj <= Uj
        del_ok = (ind_ok & ~is_I & nonempty
                  & ((is_M & allow_open) | (~is_M & allow_extend)))
        s = 1 + t
        validc[s] = live & del_ok
        candL[s] = Lj
        candU[s] = Uj
        god = ego + is_M.astype(jnp.int32)
        ged = ege + (~is_M).astype(jnp.int32)
        candM1[s] = _pack1(ei, emm, god, ged, C.STATE_D, nplen)
        candSc[s] = S.score_of(emm, god, ged)

        # match_row[c][jj] via a 5-way static select over read-base values
        if jj == C.ORDER_N:
            is_match = jnp.zeros_like(lanes)
        else:
            mr = jnp.zeros_like(cdf)
            for base in range(5):
                mr = jnp.where(cdf == base, int(_MATCH[base, jj]), mr)
            is_match = (cdf <= 3) & (mr > 0)
        member = is_match
        mm_branch = allow_diff & allow_mm
        ok_mm = mm_branch & nonempty
        ok_ex = ~mm_branch & (cdf < 4) & member & nonempty
        s = 1 + S.NC + t
        validc[s] = live & (ok_mm | ok_ex)
        candL[s] = Lj
        candU[s] = Uj
        mm_inc[s] = ok_mm & ~is_match
        mmn = emm + jnp.where(mm_inc[s], 1, 0)
        candM1[s] = _pack1(ei - 1, mmn, ego, ege, C.STATE_M, nplen)
        candSc[s] = S.score_of(mmn, ego, ege)

    # frame bookkeeping (ring: per-lane node ids from the lane's own pop
    # clock, age overflow handled in glue; fixed: trash-frame overflow
    # semantics)
    if S.RING:
        pf_row = sv_t[_SV_PF:_SV_PF + 1, :]                  # (1, B)
        base = S.NROOT + pf_row * S.NSLOT
        frame_over = fcnt < 0                     # never
        st["overflow"] = st["overflow"] | path_over
    else:
        base = S.NROOT + jnp.minimum(fcnt, S.NFRAME) * S.NSLOT
        frame_over = fcnt >= S.NFRAME
        st["overflow"] = st["overflow"] | path_over | (lanes & frame_over)
        st["ovwhy"] = st["ovwhy"] | jnp.where(lanes & frame_over, 8, 0)
        st["mode"] = jnp.where(lanes & frame_over, jnp.int32(MODE_DONE),
                               st["mode"])
    st["ovwhy"] = st["ovwhy"] | jnp.where(path_over, 4, 0)

    # score-bucket linking: sequential LIFO push of slots 0..NSLOT-1
    # (inexact_match.c:510-610).  A push's score is the parent's score
    # plus ONE of three per-lane deltas — 0 (match), p_mm (mismatch),
    # p_go/p_ge-by-state (gaps; slot 0 and the deletion slots share the
    # same per-lane delta) — and with all three scores positive and p_mm
    # distinct from the gap scores, the three bucket rows are pairwise
    # distinct and never clip (push score < NB: counters are capped at
    # the max_* bounds before a push).  So the 23 O(NB*B0) head-row
    # gathers of the naive loop collapse to 3 picks + 3 row updates, with
    # LIFO prev links chained through per-group running "last slot"
    # vectors.
    total = jnp.zeros_like(ei)
    fast_link = (S.p_mm > 0 and S.p_go > 0 and S.p_ge > 0
                 and S.p_mm != S.p_go and S.p_mm != S.p_ge)
    if fast_link:
        b_gap = escore + jnp.where(is_M, S.p_go, S.p_ge)
        b_mm = escore + S.p_mm
        b_eq = escore
        h_gap = _pick_rows(head, b_gap, S.NB)
        h_mm = _pick_rows(head, b_mm, S.NB)
        h_eq = _pick_rows(head, b_eq, S.NB)
        last_g = jnp.full_like(ei, -1)
        last_m = jnp.full_like(ei, -1)
        last_e = jnp.full_like(ei, -1)
        for s in range(S.NSLOT):
            v = validc[s] & ~frame_over
            snp_add = (int(_IS_SNP[S.chars[s - 1 - S.NC]])
                       if s >= 1 + S.NC else 0)
            if s < 1 + S.NC:
                prev_s = jnp.where(last_g >= 0, base + last_g, h_gap)
                last_g = jnp.where(v, s, last_g)
            else:
                inc = mm_inc[s]
                prev_s = jnp.where(
                    inc, jnp.where(last_m >= 0, base + last_m, h_mm),
                    jnp.where(last_e >= 0, base + last_e, h_eq))
                last_m = jnp.where(v & inc, s, last_m)
                last_e = jnp.where(v & ~inc, s, last_e)
            candM2[s] = ((esnp + snp_add) & 0xFF) | ((prev_s + 1) << 8)
            total = total + v.astype(jnp.int32)
        head = jnp.where((row_b == b_gap) & (last_g >= 0), base + last_g,
                         head)
        head = jnp.where((row_b == b_mm) & (last_m >= 0), base + last_m,
                         head)
        head = jnp.where((row_b == b_eq) & (last_e >= 0), base + last_e,
                         head)
    else:
        for s in range(S.NSLOT):
            v = validc[s] & ~frame_over
            bsel = jnp.clip(candSc[s], 0, S.NB - 1)
            prev_s = _pick_rows(head, bsel, S.NB)
            snp_add = (int(_IS_SNP[S.chars[s - 1 - S.NC]])
                       if s >= 1 + S.NC else 0)
            candM2[s] = ((esnp + snp_add) & 0xFF) | ((prev_s + 1) << 8)
            head = jnp.where(v & (row_b == bsel), base + s, head)
            total = total + v.astype(jnp.int32)
    st["n_pushed"] = st["n_pushed"] + total
    st["n_open"] = st["n_open"] + total

    # ------------------------------------------------------------ outputs
    occ2 = head >= 0
    bucket2 = jnp.min(jnp.where(occ2, row_b, S.NB), axis=0, keepdims=True)
    node_next = _pick_rows(head, bucket2, S.NB)
    # fresh-pop forward: the next pop is a node minted THIS wave (LIFO
    # descent's common case) iff the lane popped and its new head-top id
    # is in this wave's id window — carry its 4 words so the resident
    # kernel's DMA stage skips the arena pop row entirely
    fresh = (lanes & (node_next >= base)).astype(jnp.int32)
    slot_f = jnp.clip(node_next - base, 0, S.NSLOT - 1)
    nv = [_pick_rows(jnp.concatenate(fld, axis=0), slot_f, S.NSLOT)
          for fld in (candL, candU, candM1, candM2)]
    len_m1 = LEN - 1
    xs_live = _iota((S.KX, B0), 0) < jnp.maximum(
        st["x_cnt"] - (st["x_rd"] if xzp is not None else 0), 0)
    if xzp is None:
        qL = jnp.where(xs_live, st["x_L"] - 1, 0)
        qU = jnp.where(xs_live, st["x_U"], 0)
    else:
        # next wave's rank streams: slots x_rd .. x_rd+KX-1 of the (post-
        # swap / post-to_exact) current list plane, picked once here and
        # CARRIED as values in nxt (so next wave's exact step never
        # touches the planes); guarded — no exact lane, no picks
        def _mkq(qq):
            curLf = jnp.where(st["x_par"] == 0, pL0, pL1)
            curUf = jnp.where(st["x_par"] == 0, pU0, pU1)
            qLs, qUs = [], []
            for k in range(S.KX):
                sIdx = st["x_rd"] + k
                live_k = sIdx < st["x_cnt"]
                sc = jnp.clip(sIdx, 0, S.XCAP - 1)
                Lk = _pick_rows(curLf, sc, S.XCAP)
                Uk = _pick_rows(curUf, sc, S.XCAP)
                qLs.append(jnp.where(live_k, Lk - 1, 0))
                qUs.append(jnp.where(live_k, Uk, 0))
            return (jnp.concatenate(qLs, axis=0),
                    jnp.concatenate(qUs, axis=0))

        zq = jnp.zeros((S.KX, node.shape[1]), jnp.int32)
        qL, qU = jax.lax.cond(jnp.any(st["mode"] == MODE_EXACT), _mkq,
                              lambda qq: qq, (zq, zq))
    kxL = jnp.clip(qL, 0, jnp.maximum(len_m1 - 1, 0)) // BLK
    kxU = jnp.clip(qU, 0, jnp.maximum(len_m1 - 1, 0)) // BLK

    # per-lane exact fetch mask (bit q of 2*KX streams, order [L*, U*]):
    # fetch only live slots of lanes that run exact next wave, and only
    # the FIRST stream touching each 512-byte fat row — later streams
    # with the same fat id reuse the fetched row (slab redirect in the
    # resident kernel), so narrow interval lists cost ~1 DMA per slot
    # instead of 2, and invalid slots cost none
    fsh_m = S.FATB.bit_length() - 1
    x_next = st["mode"] == MODE_EXACT
    fids = [kxL[k:k + 1, :] >> fsh_m for k in range(S.KX)] + \
           [kxU[k:k + 1, :] >> fsh_m for k in range(S.KX)]
    needs = [x_next & xs_live[k % S.KX:k % S.KX + 1, :]
             for k in range(2 * S.KX)]
    xmask = jnp.zeros_like(ei)
    fetches = []
    for q in range(2 * S.KX):
        dup = jnp.zeros_like(x_next)
        for p in range(q):
            dup = dup | (fetches[p] & (fids[p] == fids[q]))
        fq = needs[q] & ~dup
        fetches.append(fq)
        xmask = xmask | (fq.astype(jnp.int32) << q)

    zero = jnp.zeros_like(ei)
    # ring: the lane's pop clock advances for exactly the popped lanes
    # (the _SV_POPPED mask), minting the node ids the NEXT pop will use
    pf_n = (pf_row + lanes.astype(jnp.int32)) if S.RING else zero
    sv_n = jnp.concatenate(
        [st["mode"], st["best_score"], st["max_diff"], st["num_best"],
         st["n_alns"], st["overflow"].astype(jnp.int32), st["n_open"],
         st["n_pushed"], st["x_cnt"], st["x_j"], st["x_node"], st["x_m1"],
         st["x_m2"], lanes.astype(jnp.int32), st["n_work"],
         st["ovwhy"], st["x_rd"], st["x_wr"], st["x_par"], st["x_tU"],
         st["x_emit"], pf_n] + [zero] * (NSV - 22), axis=0)
    oa_n = jnp.concatenate(
        [st["o_L"], st["o_U"], st["o_score"], st["o_len"], st["o_node"],
         st["o_m1"], st["o_snp"]], axis=0)
    xa_n = jnp.concatenate([st["x_L"], st["x_U"]], axis=0)
    cnd = jnp.concatenate(
        candL + candU + candM1 + candM2
        + [node, jnp.zeros((128 - 4 * S.NSLOT - 1, B0), jnp.int32)], axis=0)
    if xzp is not None:
        # feed-forward: block ids for the DMA stage + the slot VALUES for
        # next wave's exact step; xz_dirty gates the plane writeback
        nxt = jnp.concatenate(
            [node_next, kxL, kxU, qL, qU, xmask, fresh] + nv
            + [jnp.zeros((S.NXW - S.FRROW - 5, B0), jnp.int32)], axis=0)
        xz_dirty = jnp.any(lanesx) | jnp.any(to_exact)
        return (head, sv_n, oa_n, xa_n, cnd, nxt, (pL0, pU0, pL1, pU1),
                xz_dirty)
    nxt = jnp.concatenate(
        [node_next, kxL, kxU, xmask, fresh] + nv
        + [jnp.zeros((S.NXW - S.FRROW - 5, B0), jnp.int32)], axis=0)
    return head, sv_n, oa_n, xa_n, cnd, nxt


# --------------------------------------------------------------------------
# resident multi-pop kernel: the ENTIRE search loop inside one pallas_call
# --------------------------------------------------------------------------
# Economics (benchmarks/dma_probe.py, v5e): the per-iteration design costs
# ~175 us per wave at B=1024 (kernel ~100 us + ~74 us of XLA row gathers +
# dispatch), and a hard read needing P pops pays P serial waves — the
# round-2 heavy tail.  In-kernel per-lane DMA gathers cost ~70 ns/row
# (scalar-issue-bound; waits are free via one shared-semaphore wait for
# the wave's total bytes), so a B-lane wave that fetches its own pop rows
# and rank fat-rows costs ~(1 + RQ) * B * 70 ns of scalar time plus the
# VPU compute — and the XLA glue, launch overhead, and transfer chatter
# disappear entirely.  One launch runs a whole batch to completion.

(_SC_FCNT, _SC_LEN, _SC_ITER, _SC_MAXIT, _SC_CNTR, _SC_NR, _SC_FLG,
 _SC_URG, _SC_DOSW, _SC_POPN, _SC_FATN, _SC_WRN) = range(12)


def _resident_kernel(S: _Static, *refs):
    """One pallas_call = the whole fixed-batch search loop.

    State lives in the VMEM *output* refs (initialized from the input
    refs, read-modified-written every wave); the frame arena stays in HBM
    (aliased in/out) and is read/written by per-lane DMA.  Wave t:

      1. pop-row fetch: per-lane DMA aN[f_b, b] -> popbuf (frame ids from
         the previous wave's node_next, staged to SMEM);
      2. rank-row fetch: per-lane DMA of RQ fat rows (512 B) at block ids
         derived from the popped node (DFS streams) and the exact-scan
         state (exact streams);
      3. _iter_math — the identical per-iteration compute the glue kernel
         runs (bit-exact results by construction);
      4. frame write: interleave + transpose the candidate rows, DMA to
         aN[wslot] (waited at the end of the wave, v1).
    """
    (scal_ref, carr_ref, rtN_ref, rcx_ref, dnw_ref, dsw_ref,
     head_i, sv_i, oa_i, xa_i, nxt_i, qrow_ref, tbl_ref, aN_i, xz_i,
     scal_o, head_o, sv_o, oa_o, xa_o, nxt_o, aN_o, xz_o,
     popbuf, fatbuf, framebuf, stage, sidx, xzscr,
     psem, fsem, wsem, ssem) = refs
    # xz planes: VMEM scratch in fixed mode (state dies with the launch);
    # carried through the aliased in/out pair only in ring mode, where
    # exact scans span kernel segments
    xzbuf = xz_o if S.RING else xzscr
    B = head_i.shape[1]
    SH = stage.shape[0]
    LEN = scal_ref[0, _SC_LEN]
    len_m1 = LEN - 1
    max_iters = scal_ref[0, _SC_MAXIT]

    head_o[:] = head_i[:]
    sv_o[:] = sv_i[:]
    oa_o[:] = oa_i[:]
    xa_o[:] = xa_i[:]
    nxt_o[:] = nxt_i[:]
    if S.RING:
        start_f = qrow_ref[0:1, :]
        flushed = qrow_ref[1:2, :] != 0
        counter = scal_ref[0, _SC_CNTR]
        NRs = scal_ref[0, _SC_NR]
        FLG = scal_ref[0, _SC_FLG]
        URG = scal_ref[0, _SC_URG]

    if S.XCAP > 0 and S.RING:
        xzbuf[:] = xz_i[:]
    if not S.RING:
        xz_o[:] = jnp.zeros_like(xz_o)
    fsh = S.FATB.bit_length() - 1
    blk_of = lambda i: (jnp.clip(i, 0, jnp.maximum(len_m1 - 1, 0))
                        // BLK).astype(jnp.int32)

    def sync_stage():
        cp = pltpu.make_async_copy(stage, sidx, ssem)
        cp.start()
        cp.wait()

    # The wave is SCALAR-bound: (1 + RQ) * B DMA issue instructions
    # dominate it (measured ~14 ns/issue at B=1024 — the [XCAP, B] vector
    # machinery hides almost entirely under the issue loops).  Scalar
    # work is therefore made proportional to LIVE work:
    # - per-8-lane-block skipping: the issue loops stay fully unrolled
    #   (dynamic-bound fori loops measured +20 us/wave of induction
    #   overhead), but every 8-lane block is guarded by a pl.when on a
    #   per-block need flag (lane-shift OR-tree in vector land, staged
    #   through SMEM).  DONE lanes stop paying 7 issues each — lockstep
    #   waste becomes free masked vector lanes;
    # - stream census: waves with no exact-mode lane skip all 2*KX exact
    #   streams wholesale; waves with no popping lane skip the pop + 2
    #   DFS streams (the deferred-resume rule S.DEFER makes "popping
    #   lane" knowable at wave start).
    # Waits stay byte-exact: the wait loops run under the same per-block
    # flags as the issues, in 8-row static-size chunks.
    ROWS8 = 8
    NBLK = B // ROWS8

    def _block_any8(m):
        """(1, B) bool -> (1, B) int32 where lane 8k >= any(m[8k..8k+7])
        (log rotate-OR tree; only block-start lanes are read).  Uses
        circular pltpu.roll — the lane-concat form hits an unimplemented
        Mosaic concat lowering when the input carries an offset layout —
        so the LAST block's flag may over-approximate (its window wraps
        to lanes 0..6).  Harmless: block flags only gate per-lane guards,
        which decide every actual issue/wait."""
        x = m.astype(jnp.int32)
        for sh in (1, 2, 4):
            x = x | pltpu.roll(x, B - sh, 1)
        return x

    def _wait_rows(sem, dst, src, n):
        """Consume n single-row DMA completions on `sem` in chunks:
        trips of 128 rows + a 7-bit binary remainder — O(n/128 + 7)
        scalar ops instead of one guarded branch per issued row.  The
        descriptors only supply the byte count; rows are uniform."""
        def _w128(_, c):
            pltpu.make_async_copy(src.at[pl.ds(0, 128)],
                                  dst.at[pl.ds(0, 128)], sem).wait()
            return c
        jax.lax.fori_loop(0, n // 128, _w128, jnp.int32(0),
                          unroll=False)
        for k in range(6, -1, -1):
            @pl.when(((n >> k) & 1) > 0)
            def _wk(k=k):
                pltpu.make_async_copy(src.at[pl.ds(0, 1 << k)],
                                      dst.at[pl.ds(0, 1 << k)],
                                      sem).wait()

    def cond(c):
        it, fcnt, alive, last_w, wpend, do_sw = c[:6]
        # EXITA (fixed mode only): stop once the batch is nearly drained —
        # straggler lanes time out into the escalation ladder rather than
        # the whole batch paying near-empty waves
        exit_a = 0 if S.RING else S.EXITA
        return (alive > exit_a) & (it < max_iters) & (do_sw == 0)

    def body(c):
        it, fcnt, last_w, wpend = c[0], c[1], c[3], c[4]
        cp, cf, cw = c[6], c[7], c[8]    # HBM DMA row counters (roofline)
        sv_t = sv_o[:]
        if S.RING:
            # ring budget: a read that has made NFRAME pops is about to
            # lose its oldest frame row — flag overflow + DONE before any
            # stale row could be read (engine/inexact.py body()).  Age is
            # the lane's OWN pop clock (per-read exact; exact-completion
            # waves cost no budget)
            age = sv_t[_SV_PF:_SV_PF + 1, :] - start_f
            mrow = sv_t[_SV_MODE:_SV_MODE + 1, :]
            ring_over = (mrow != MODE_DONE) & (age >= S.NFRAME)
            sv_t = jnp.concatenate(
                [jnp.where(ring_over, jnp.int32(MODE_DONE), mrow),
                 sv_t[1:_SV_OVER],
                 sv_t[_SV_OVER:_SV_OVER + 1]
                 | ring_over.astype(jnp.int32),
                 sv_t[_SV_OVER + 1:]], axis=0)
            sv_o[:] = sv_t
        nxt = nxt_o[:]
        node = nxt[0:1, :]                                 # (1, B)
        mode0 = sv_t[_SV_MODE:_SV_MODE + 1, :]
        was_dfs = mode0 == MODE_DFS
        was_x = mode0 == MODE_EXACT

        if S.WROVL:
            # the previous wave's frame writes must land before this wave's
            # arena reads (ring: wpend counts per-lane row writes)
            if S.RING:
                _wait_rows(wsem, framebuf, aN_o.at[0], wpend)
            else:
                @pl.when(wpend > 0)
                def _wr():
                    pltpu.make_async_copy(framebuf, aN_o.at[0],
                                          wsem).wait()

        # ---- census + per-lane / per-block need flags
        alive_l = mode0 != MODE_DONE
        # DFS streams serve every lane that may pop this wave: exactly the
        # was_dfs set under deferred resume (S.DEFER); without it (xcap=0)
        # an exact/emit lane can finish mid-wave and pop, so any alive
        # lane may need them
        dfs_need = was_dfs if S.DEFER else alive_l

        # ---- 1. pop-row fetch (mirrors glue's arena gather)
        nn = jnp.maximum(node - S.NROOT, 0)
        fq = nn // S.NSLOT
        if S.RING:
            f = fq % S.NFRAME
        else:
            f = jnp.minimum(fq, S.NFRAME)                  # NAREN-1 trash ok
        is_root = node < S.NROOT
        # Per-lane DMA skipping: every issue (and its wait) is guarded by
        # a per-lane flag staged through SMEM — a DONE lane pays two
        # scalar branches instead of (1 + RQ) issues, a root pop skips
        # its arena row (the words come from rtN), and the exact fetch
        # mask (bit q = stream q's fat row is live AND not a duplicate of
        # an earlier stream's row, computed in _iter_math) makes narrow
        # interval lists cost ~1 DMA per slot instead of 2.  8-lane block
        # guards remain as a cheap outer skip for fully dead blocks.
        #
        # sync1 row layout: 0 = pop frame ids, 1 = per-lane pop-fetch
        # flag, 2 = per-lane exact fetch mask, 3 = global pop flag,
        # 4 = global exact flag, 5 = pop 8-block flags, 6 = exact 8-block
        # flags, 7 = global dfs flag, 8.. = exact fat ids,
        # 8+2KX = total pop issues, 9+2KX = total exact-fat issues
        fresh_v = nxt[S.FRROW:S.FRROW + 1]                 # (1, B)
        popfetch = dfs_need & ~is_root & (fresh_v == 0)
        xmask_v = nxt[S.XMROW:S.XMROW + 1]                 # (1, B)
        fat_x = nxt[1:1 + 2 * S.KX] >> fsh                 # [2KX, B]
        # exact issue totals (count-proportional waits): per-lane guards
        # keep dead lanes from ISSUING, and the wait side consumes the
        # POPCOUNT of the same flags through chunked shared-semaphore
        # waits — so neither side pays a per-lane scalar branch per wave
        # (the round-3 static full-batch wait was cheap only because the
        # issues were unconditional)
        n_pop = jnp.sum(popfetch.astype(jnp.int32), dtype=jnp.int32)
        n_x = jnp.zeros((), jnp.int32)
        for q in range(2 * S.KX):
            n_x = n_x + jnp.sum((xmask_v >> q) & 1, dtype=jnp.int32)
        stage[:] = jnp.concatenate(
            [f, popfetch.astype(jnp.int32), xmask_v,
             jnp.full((1, B), jnp.any(popfetch).astype(jnp.int32),
                      jnp.int32),
             jnp.full((1, B), jnp.any(xmask_v != 0).astype(jnp.int32),
                      jnp.int32),
             _block_any8(popfetch), _block_any8(xmask_v != 0),
             jnp.full((1, B), jnp.any(dfs_need).astype(jnp.int32),
                      jnp.int32),
             fat_x,
             jnp.full((1, B), n_pop, jnp.int32),
             jnp.full((1, B), n_x, jnp.int32)]
            + ([jnp.zeros((SH - 10 - 2 * S.KX, B), jnp.int32)]
               if SH > 10 + 2 * S.KX else []), axis=0)
        sync_stage()
        has_pop = sidx[3, 0] > 0
        has_x = sidx[4, 0] > 0
        has_dfs = sidx[7, 0] > 0

        @pl.when(has_pop)
        def _issue_pop():
            for blk in range(NBLK):
                @pl.when(sidx[5, blk * ROWS8] > 0)
                def _b(blk=blk):
                    for u in range(ROWS8):
                        b = blk * ROWS8 + u
                        @pl.when(sidx[1, b] > 0)
                        def _l(b=b):
                            pltpu.make_async_copy(
                                aN_o.at[sidx[0, b], b], popbuf.at[b],
                                psem).start()

        @pl.when(has_x)
        def _issue_xfat():
            for blk in range(NBLK):
                @pl.when(sidx[6, blk * ROWS8] > 0)
                def _b(blk=blk):
                    for u in range(ROWS8):
                        b = blk * ROWS8 + u
                        m = sidx[2, b]
                        for q in range(2, S.RQ):
                            @pl.when(((m >> (q - 2)) & 1) > 0)
                            def _q(b=b, q=q):
                                pltpu.make_async_copy(
                                    tbl_ref.at[sidx[8 + q - 2, b]],
                                    fatbuf.at[q * B + b], fsem).start()

        @pl.when(has_pop)
        def _wait_pop():
            _wait_rows(psem, popbuf, aN_o.at[0], sidx[8 + 2 * S.KX, 0])

        popT = popbuf[:].T                                 # [ROWW, B]
        s_ = nn - fq * S.NSLOT                             # (1, B)
        aV = []
        for j in range(4):
            acc = jnp.zeros((1, B), jnp.int32)
            for s in range(S.NSLOT):
                acc = jnp.where(s_ == s, popT[4 * s + j:4 * s + j + 1, :],
                                acc)
            aV.append(acc)
        aV = jnp.concatenate(aV, axis=0)                   # [4, B]
        # fresh-pop nodes come from the forwarded VMEM words.  Root wins
        # over a (possibly stale) fresh flag: after a switch refill the
        # lane's nxt rows 1.. still carry the PREVIOUS read's forward,
        # but its head holds only root ids — fresh and root are disjoint
        # otherwise (fresh ids are >= base >= NROOT).
        node4 = jnp.where(is_root, rtN_ref[:],
                          jnp.where(fresh_v != 0,
                                    nxt[S.FRROW + 1:S.FRROW + 5], aV))

        # ---- 2. DFS rank fat-row fetch (ids need the popped node)
        eL = node4[0:1, :]
        eU = node4[1:2, :]
        kdfs = jnp.concatenate([blk_of(eL - 1), blk_of(eU)], axis=0)
        kAll = jnp.concatenate([kdfs, nxt[1:1 + 2 * S.KX]], axis=0)
        subm = jnp.concatenate(
            [kAll & (S.FATB - 1),
             jnp.zeros((S.SUBW - S.RQ, B), jnp.int32)], axis=0)
        # DFS fat-row dedupe: (eL - 1) and eU share one 512-byte fat row
        # whenever the interval is narrower than the row span — the
        # common case after a few extended chars — so stream 1 is only
        # fetched when its row differs (slab redirect below)
        fid_d = kdfs >> fsh                                # [2, B]
        dup1 = fid_d[0:1, :] == fid_d[1:2, :]
        fetch1 = dfs_need & ~dup1
        # sync2 row layout: 0-1 = DFS fat ids, 2 = per-lane dfs flag,
        # 3 = per-lane stream-1 fetch flag, 4 = dfs 8-block flags,
        # 5 = exact fetch mask (copy), 6 = exact 8-block flags (copy),
        # 7 = total fsem issues (exact-fat + both DFS streams)
        n_fat = (n_x + jnp.sum(dfs_need.astype(jnp.int32), dtype=jnp.int32)
                 + jnp.sum(fetch1.astype(jnp.int32), dtype=jnp.int32))
        stage[:] = jnp.concatenate(
            [fid_d, dfs_need.astype(jnp.int32), fetch1.astype(jnp.int32),
             _block_any8(dfs_need), xmask_v, _block_any8(xmask_v != 0),
             jnp.full((1, B), n_fat, jnp.int32),
             jnp.zeros((SH - 8, B), jnp.int32)], axis=0)
        sync_stage()

        @pl.when(has_dfs)
        def _issue_dfat():
            for blk in range(NBLK):
                @pl.when(sidx[4, blk * ROWS8] > 0)
                def _b(blk=blk):
                    for u in range(ROWS8):
                        b = blk * ROWS8 + u
                        @pl.when(sidx[2, b] > 0)
                        def _l0(b=b):
                            pltpu.make_async_copy(
                                tbl_ref.at[sidx[0, b]],
                                fatbuf.at[b], fsem).start()
                        @pl.when(sidx[3, b] > 0)
                        def _l1(b=b):
                            pltpu.make_async_copy(
                                tbl_ref.at[sidx[1, b]],
                                fatbuf.at[B + b], fsem).start()

        @pl.when(has_x | has_dfs)
        def _wait_fat():
            _wait_rows(fsem, fatbuf, tbl_ref, sidx[7, 0])

        # slab pick with duplicate-row redirect: a stream whose fat row
        # was not fetched (dup of an earlier stream) picks from the
        # earlier stream's buffer; unfetched AND un-duplicated streams
        # (dead lanes / invalid slots) pick stale rows that downstream
        # masks discard, exactly as the block-skip path always did
        xts = [fatbuf[q * B:(q + 1) * B, :].T for q in range(S.RQ)]
        effs = [xts[0], jnp.where(dup1, xts[0], xts[1])]
        fbit = [(xmask_v >> q) & 1 for q in range(2 * S.KX)]
        for q in range(2 * S.KX):
            eff = xts[2 + q]
            for p in range(q):
                red = ((fbit[q] == 0) & (fbit[p] == 1)
                       & (fat_x[p:p + 1, :] == fat_x[q:q + 1, :]))
                eff = jnp.where(red, xts[2 + p], eff)
            effs.append(eff)
        slabs = []
        for q in range(S.RQ):
            sq = subm[q:q + 1, :]
            slab = effs[q][0:32]
            for v in range(1, S.FATB):
                slab = jnp.where(sq == v, effs[q][32 * v:32 * (v + 1)],
                                 slab)
            slabs.append(slab)
        rows = jnp.concatenate(slabs, axis=0)              # [RQ*32, B]

        # ---- 3. the shared per-iteration compute
        if S.XCAP > 0:
            X = S.XCAP
            xzp = (xzbuf[0 * X:1 * X, :], xzbuf[1 * X:2 * X, :],
                   xzbuf[2 * X:3 * X, :], xzbuf[3 * X:4 * X, :])
            head_n, sv_n, oa_n, xa_n, cnd, nxt_n, xz_n, xz_dirty = \
                _iter_math(
                    S, fcnt, LEN, carr_ref[:], rows, node4, rcx_ref[:],
                    dnw_ref[:], dsw_ref[:], head_o[:], sv_t, oa_o[:],
                    xa_o[:], xzp=xzp,
                    xv=nxt[1 + 2 * S.KX:1 + 4 * S.KX, :])

            # skip the ~2 MB plane writeback on waves that touched no
            # exact state (xz_n == xzp elementwise then)
            @pl.when(xz_dirty)
            def _xzw():
                xzbuf[:] = jnp.concatenate(xz_n, axis=0)
        else:
            head_n, sv_n, oa_n, xa_n, cnd, nxt_n = _iter_math(
                S, fcnt, LEN, carr_ref[:], rows, node4, rcx_ref[:],
                dnw_ref[:], dsw_ref[:], head_o[:], sv_t, oa_o[:], xa_o[:])
        head_o[:] = head_n
        sv_o[:] = sv_n
        oa_o[:] = oa_n
        xa_o[:] = xa_n
        nxt_o[:] = nxt_n

        # ---- 4. frame write (interleaved arena row layout, transposed)
        rows_l = []
        for s in range(S.NSLOT):
            for fld in range(4):
                rows_l.append(cnd[fld * S.NSLOT + s:fld * S.NSLOT + s + 1])
        rows_l.append(cnd[4 * S.NSLOT:4 * S.NSLOT + 1])    # parent node id
        frowT = jnp.concatenate(
            rows_l + [jnp.zeros((S.ROWW - 1 - 4 * S.NSLOT, B), jnp.int32)],
            axis=0)                                        # [ROWW, B]
        framebuf[:] = frowT.T
        if S.RING:
            # per-lane ring slots: lane b's row goes to slot pf[b] % NFRAME
            # of its own column (pf = the lane's pop clock BEFORE this
            # wave's increment — the ids minted this wave used that base).
            # Only popped lanes write; non-popping lanes' rows are garbage
            # and their pf is unchanged, so skipping them is free.
            # stage3 rows: 0 = write slot, 1 = popped flag, 2 = 8-block
            # flags, 3 = total writes
            popped_v = sv_n[_SV_POPPED:_SV_POPPED + 1, :]
            wslot_v = sv_t[_SV_PF:_SV_PF + 1, :] % S.NFRAME
            n_wr = jnp.sum(popped_v, dtype=jnp.int32)
            stage[:] = jnp.concatenate(
                [wslot_v, popped_v, _block_any8(popped_v != 0),
                 jnp.full((1, B), n_wr, jnp.int32),
                 jnp.zeros((SH - 4, B), jnp.int32)], axis=0)
            sync_stage()

            @pl.when(sidx[3, 0] > 0)
            def _issue_wr():
                for blk in range(NBLK):
                    @pl.when(sidx[2, blk * ROWS8] > 0)
                    def _b(blk=blk):
                        for u in range(ROWS8):
                            b = blk * ROWS8 + u
                            @pl.when(sidx[1, b] > 0)
                            def _l(b=b):
                                pltpu.make_async_copy(
                                    framebuf.at[b],
                                    aN_o.at[sidx[0, b], b], wsem).start()
            wpend_n = sidx[3, 0]
            if not S.WROVL:
                _wait_rows(wsem, framebuf, aN_o.at[0], wpend_n)
                wpend_n = jnp.int32(0)
            wslot = fcnt % S.NFRAME        # carried for diagnostics only
        else:
            wslot = jnp.minimum(fcnt, S.NFRAME)
            wcp = pltpu.make_async_copy(framebuf, aN_o.at[wslot], wsem)
            wcp.start()
            wpend_n = jnp.int32(1)
            if not S.WROVL:
                wcp.wait()
                wpend_n = jnp.int32(0)

        any_pop = jnp.sum(sv_n[_SV_POPPED:_SV_POPPED + 1, :],
                          dtype=jnp.int32) > 0
        alive = jnp.sum(
            (sv_n[_SV_MODE:_SV_MODE + 1, :] != MODE_DONE).astype(jnp.int32),
            dtype=jnp.int32)
        fcnt_n = fcnt + any_pop.astype(jnp.int32)
        if S.RING:
            # flush gate (engine/inexact.py body()): exit the segment so
            # the XLA switch_step can flush finished lanes and refill.
            # Ring-age marking must run BEFORE the gate with the post-wave
            # fcnt — the XLA body checks age at the TOP of each iteration,
            # ahead of its flush check, so a lane aging out at fcnt_n
            # counts toward nfin NOW; deferring it to the next wave's
            # top-of-body check would fire the flush one wave later than
            # the XLA loop and shift every subsequent refill (the
            # top-of-body check stays — it re-marks idempotently and
            # covers post-switch start_f updates)
            mode_n = sv_n[_SV_MODE:_SV_MODE + 1, :]
            age_n = sv_n[_SV_PF:_SV_PF + 1, :] - start_f
            ring_over_n = (mode_n != MODE_DONE) & (age_n >= S.NFRAME)
            mode_n = jnp.where(ring_over_n, jnp.int32(MODE_DONE), mode_n)
            sv_n = jnp.concatenate(
                [mode_n, sv_n[1:_SV_OVER],
                 sv_n[_SV_OVER:_SV_OVER + 1]
                 | ring_over_n.astype(jnp.int32),
                 sv_n[_SV_OVER + 1:]], axis=0)
            sv_o[:] = sv_n
            alive = jnp.sum((mode_n != MODE_DONE).astype(jnp.int32),
                            dtype=jnp.int32)
            fin = (mode_n == MODE_DONE) & ~flushed
            nfin = jnp.sum(fin.astype(jnp.int32), dtype=jnp.int32)
            urgent = jnp.sum(
                (fin & (age_n >= URG)).astype(jnp.int32),
                dtype=jnp.int32) > 0
            drain = (counter >= NRs) | (alive == 0)
            do_sw = ((nfin >= FLG) | ((nfin > 0) & drain)
                     | urgent).astype(jnp.int32)
        else:
            do_sw = jnp.int32(0)
        # roofline counters: pop rows + rank fat rows actually DMA'd this
        # wave (the same totals the chunked waits consume), plus the frame
        # write's B rows — all 512-byte HBM rows
        cp_n = cp + n_pop
        cf_n = cf + n_fat
        cw_n = cw + (wpend_n if S.RING else jnp.int32(B))
        return (it + 1, fcnt_n, alive, wslot, wpend_n, do_sw,
                cp_n, cf_n, cw_n)

    alive0 = jnp.sum(
        (sv_i[_SV_MODE:_SV_MODE + 1, :] != MODE_DONE).astype(jnp.int32),
        dtype=jnp.int32)
    (it, fcnt, _, _, wpend, do_sw_f, cpf, cff, cwf) = jax.lax.while_loop(
        cond, body,
        (scal_ref[0, _SC_ITER], scal_ref[0, _SC_FCNT], alive0,
         jnp.int32(-1), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    # drain the final in-flight frame write(s) before the kernel exits
    if S.WROVL:
        if S.RING:
            _wait_rows(wsem, framebuf, aN_o.at[0], wpend)
        else:
            @pl.when(wpend > 0)
            def _wr2():
                pltpu.make_async_copy(framebuf, aN_o.at[0], wsem).wait()
    scal_o[0, _SC_FCNT] = fcnt
    scal_o[0, _SC_ITER] = it
    scal_o[0, _SC_DOSW] = do_sw_f
    scal_o[0, _SC_POPN] = cpf
    scal_o[0, _SC_FATN] = cff
    scal_o[0, _SC_WRN] = cwf
    scal_o[0, _SC_LEN] = 0
    for k in range(3, 8):
        scal_o[0, k] = 0
    for k in range(12, 16):
        scal_o[0, k] = 0


def run_loop_resident(didx, state, params, cfg, B, Lmax, NROOT):
    """Resident-kernel replacement for run_loop (fixed batch, int32,
    multiref, NROOT == 1): ONE pallas_call runs the whole search loop,
    with in-kernel DMA for arena pops, rank-row gathers, and frame
    writes.  Results are bit-identical to run_loop/_search by
    construction (_iter_math is shared)."""
    S = _Static(params, cfg, B, Lmax, NROOT)
    S.DEFER = S.XCAP > 0
    if NROOT != 1:
        raise ValueError(
            "backend='resident' covers int32 multiref searches without "
            "seeds (NROOT == 1); seeded searches route to the XLA body")
    NAREN = state["aN"].shape[0]

    lengths_v = state["len"]
    length32 = didx.length.astype(jnp.int32)
    carrv = jnp.concatenate([didx.Carr.astype(jnp.int32),
                             jnp.zeros((15,), jnp.int32)]).reshape(32, 1)
    tbl = didx.table
    padr = (-tbl.shape[0]) % S.FATB
    if padr:
        tbl = jnp.pad(tbl, ((0, padr), (0, 0)))
    table4 = tbl.reshape(-1, S.FATW)

    rcx0, dnw0, dsw0 = _lane_tables(S, B, state["rc"], lengths_v,
                                    state["D"], state["Ds"])

    # initial lane-major planes (same packing as run_loop)
    sv0 = jnp.stack(
        [state["mode"], state["best_score"], state["max_diff"],
         state["num_best"], state["n_alns"],
         state["overflow"].astype(jnp.int32), state["n_open"],
         state["n_pushed"], state["x_cnt"], state["x_j"], state["x_node"],
         state["x_m1"], state["x_m2"]]
        + [jnp.zeros((B,), jnp.int32)] * (NSV - 13), axis=0)
    oa0 = jnp.concatenate(
        [state["o_L"].T, state["o_U"].T, state["o_score"].T,
         state["o_len"].T, state["o_node"].T, state["o_m1"].T,
         state["o_snp"].T], axis=0)
    xa0 = jnp.concatenate([state["x_L"].T, state["x_U"].T], axis=0)
    head0 = state["head"].T                                # [NB, B]
    row_b = jnp.arange(S.NB, dtype=jnp.int32)[:, None]
    b0 = jnp.min(jnp.where(head0 >= 0, row_b, S.NB), axis=0)
    node0 = jnp.sum(jnp.where(row_b == b0[None, :], head0, 0), axis=0,
                    dtype=jnp.int32)
    nxt0 = jnp.zeros((S.NXW, B), jnp.int32).at[0].set(node0)
    rtN0 = state["rtN"][:, 0].T                            # [4, B]

    scal0 = jnp.zeros((1, 16), jnp.int32)
    scal0 = scal0.at[0, _SC_FCNT].set(state["fcnt"])
    scal0 = scal0.at[0, _SC_LEN].set(length32)
    scal0 = scal0.at[0, _SC_ITER].set(state["iters"])
    scal0 = scal0.at[0, _SC_MAXIT].set(jnp.int32(int(cfg.max_iters)))
    qrow0 = jnp.zeros((8, B), jnp.int32)
    xz0 = jnp.zeros((8, B), jnp.int32)

    kern = functools.partial(_resident_kernel, S)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pltpu.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scal_o, head_n, sv_n, oa_n, xa_n, nxt_n, aN_n, _xz = _resident_call(
        S, kern, state["aN"].shape, B,
        (scal0, carrv, rtN0, rcx0, dnw0, dsw0,
         head0, sv0, oa0, xa0, nxt0, qrow0, table4, state["aN"], xz0))

    out = dict(state)
    sv = sv_n
    oa = oa_n
    out.update(
        aN=aN_n, head=head_n.T,
        mode=sv[_SV_MODE], best_score=sv[_SV_BEST],
        max_diff=sv[_SV_MAXD], num_best=sv[_SV_NBEST],
        n_alns=sv[_SV_NALN], overflow=sv[_SV_OVER] != 0,
        n_open=sv[_SV_NOPEN], n_pushed=sv[_SV_NPUSH],
        x_cnt=sv[_SV_XCNT], x_j=sv[_SV_XJ], x_node=sv[_SV_XNODE],
        x_m1=sv[_SV_XM1], x_m2=sv[_SV_XM2],
        o_L=oa[0 * S.ACAP:1 * S.ACAP].T, o_U=oa[1 * S.ACAP:2 * S.ACAP].T,
        o_score=oa[2 * S.ACAP:3 * S.ACAP].T,
        o_len=oa[3 * S.ACAP:4 * S.ACAP].T,
        o_node=oa[4 * S.ACAP:5 * S.ACAP].T,
        o_m1=oa[5 * S.ACAP:6 * S.ACAP].T,
        o_snp=oa[6 * S.ACAP:7 * S.ACAP].T,
        x_L=xa_n[:S.KX].T, x_U=xa_n[S.KX:].T,
        n_work=sv[_SV_NWORK], ovwhy=sv[_SV_OVWHY],
        iters=scal_o[0, _SC_ITER], fcnt=scal_o[0, _SC_FCNT],
        dma_pop=scal_o[0, _SC_POPN], dma_fat=scal_o[0, _SC_FATN],
        dma_wr=scal_o[0, _SC_WRN],
    )
    return out


def run_loop_resident_queued(didx, state, params, cfg, B, Lmax, NROOT,
                             queued_ctx):
    """Ring-queue resident mode: the kernel runs wave SEGMENTS (exiting
    when the flush gate fires), and the parity-tested XLA switch_step
    (flush + ring path walks + refill, engine/inexact.py) runs between
    segments.  Continuous batching makes the iteration count
    (total work / B)-bound instead of per-batch max-bound — the fixed
    tiers measured ~2.7x lockstep waste on the chr21 mix."""
    S = _Static(params, cfg, B, Lmax, NROOT)
    # Deferred DFS-resume (see _Static.DEFER): a lane finishing its exact
    # scan pops NEXT wave, so exact-mode lanes skip the pop-row and DFS
    # fat-row DMAs entirely.  Per-READ results are delay-invariant (the
    # per-lane pop clock makes node ids a function of the lane's pop
    # SEQUENCE, not wave timing); flush timing can shift by a wave, so
    # per-LANE diagnostics (o_node, n_pushed) may differ from the
    # XLA queue body's — the parity tests compare per-read outputs.
    S.DEFER = S.XCAP > 0 and bool(int(
        __import__("os").environ.get("BWBBLE_RING_DEFER", "1")))
    S.RING = True
    if NROOT != 1:
        raise ValueError(
            "backend='resident' (queued) covers int32 multiref searches "
            "without seeds (NROOT == 1)")
    qkeys = ("rc", "len", "D", "Ds", "rtN", "cur", "counter", "flushed",
             "start_f", "q_alns", "q_meta", "q_paths")
    switch_fn = queued_ctx["switch_step"]
    NR_q = int(queued_ctx["NR"])
    FL_q = int(queued_ctx["FL"])
    urg = max(2, S.NFRAME - (B // FL_q) - 2)
    # flush gate: mirrors the XLA queue body's `nfin >= FL`.  Per-READ
    # results are assignment-invariant under the per-lane pop clock
    # (overflow <=> the read needs > NFRAME pops), but per-LANE
    # diagnostics (o_node ids, n_pushed) still depend on refill order,
    # and the parity tests compare those — keep the gates identical.
    flg = FL_q
    lane_iota = jnp.arange(B, dtype=jnp.int32)
    length32 = didx.length.astype(jnp.int32)
    carrv = jnp.concatenate([didx.Carr.astype(jnp.int32),
                             jnp.zeros((15,), jnp.int32)]).reshape(32, 1)
    tbl = didx.table
    padr = (-tbl.shape[0]) % S.FATB
    if padr:
        tbl = jnp.pad(tbl, ((0, padr), (0, 0)))
    table4 = tbl.reshape(-1, S.FATW)
    kern = functools.partial(_resident_kernel, S)

    def pack_sv(d, prev_sv):
        zb = jnp.zeros((B,), jnp.int32)
        base = jnp.stack(
            [d["mode"], d["best_score"], d["max_diff"], d["num_best"],
             d["n_alns"], d["overflow"].astype(jnp.int32), d["n_open"],
             d["n_pushed"], d["x_cnt"], d["x_j"], d["x_node"], d["x_m1"],
             d["x_m2"]], axis=0)
        return jnp.concatenate([base, prev_sv[13:]], axis=0)

    def carry_to_dict(cr):
        sv, oa = cr["sv"], cr["oa"]
        d = dict(
            aN=cr["aN"], head=cr["head"].T,
            mode=sv[_SV_MODE], best_score=sv[_SV_BEST],
            max_diff=sv[_SV_MAXD], num_best=sv[_SV_NBEST],
            n_alns=sv[_SV_NALN], overflow=sv[_SV_OVER] != 0,
            n_open=sv[_SV_NOPEN], n_pushed=sv[_SV_NPUSH],
            x_cnt=sv[_SV_XCNT], x_j=sv[_SV_XJ], x_node=sv[_SV_XNODE],
            x_m1=sv[_SV_XM1], x_m2=sv[_SV_XM2],
            o_L=oa[0 * S.ACAP:1 * S.ACAP].T,
            o_U=oa[1 * S.ACAP:2 * S.ACAP].T,
            o_score=oa[2 * S.ACAP:3 * S.ACAP].T,
            o_len=oa[3 * S.ACAP:4 * S.ACAP].T,
            o_node=oa[4 * S.ACAP:5 * S.ACAP].T,
            o_m1=oa[5 * S.ACAP:6 * S.ACAP].T,
            o_snp=oa[6 * S.ACAP:7 * S.ACAP].T,
            x_L=cr["xa"][:S.KX].T, x_U=cr["xa"][S.KX:].T,
            pf=sv[_SV_PF], fcnt=cr["fcnt"], iters=cr["iters"])
        d.update({k: cr[k] for k in qkeys})
        return d

    def dict_to_carry(d, cr):
        sv = pack_sv(d, cr["sv"])
        oa = jnp.concatenate(
            [d["o_L"].T, d["o_U"].T, d["o_score"].T, d["o_len"].T,
             d["o_node"].T, d["o_m1"].T, d["o_snp"].T], axis=0)
        xa = jnp.concatenate([d["x_L"].T, d["x_U"].T], axis=0)
        headT = d["head"].T
        rb = _iota((S.NB, B), 0)
        b0 = jnp.min(jnp.where(headT >= 0, rb, S.NB), axis=0)
        node0 = jnp.sum(jnp.where(rb == b0[None, :], headT, 0), axis=0,
                        dtype=jnp.int32)
        out = dict(cr, aN=d["aN"], head=headT, sv=sv, oa=oa, xa=xa,
                   nxt=cr["nxt"].at[0].set(node0), fcnt=d["fcnt"])
        out.update({k: d[k] for k in qkeys})
        out["rcx"], out["dnw"], out["dsw"] = _lane_tables(
            S, B, d["rc"], d["len"], d["D"], d["Ds"])
        return out

    def switch_wrap(cr):
        return dict_to_carry(switch_fn(carry_to_dict(cr)), cr)

    def cond(cr):
        sv = cr["sv"]
        alive = jnp.any(sv[_SV_MODE] != MODE_DONE)
        alive = alive | (cr["counter"] < NR_q) \
            | jnp.any((sv[_SV_MODE] == MODE_DONE)
                      & ~cr["flushed"] & (lane_iota < NR_q))
        return alive & (cr["iters"] < cfg.max_iters)

    def body(cr):
        scal = jnp.zeros((1, 16), jnp.int32)
        for k, v in ((_SC_FCNT, cr["fcnt"]), (_SC_LEN, length32),
                     (_SC_ITER, cr["iters"]),
                     (_SC_MAXIT, jnp.int32(int(cfg.max_iters))),
                     (_SC_CNTR, cr["counter"]), (_SC_NR, jnp.int32(NR_q)),
                     (_SC_FLG, jnp.int32(flg)), (_SC_URG, jnp.int32(urg))):
            scal = scal.at[0, k].set(v)
        qrow = jnp.zeros((8, B), jnp.int32) \
            .at[0].set(cr["start_f"]) \
            .at[1].set(cr["flushed"].astype(jnp.int32))
        rtN0 = cr["rtN"][:, 0].T
        scal_o, head_n, sv_n, oa_n, xa_n, nxt_n, aN_n, xz_n = \
            _resident_call(
                S, kern, cr["aN"].shape, B,
                (scal, carrv, rtN0, cr["rcx"], cr["dnw"], cr["dsw"],
                 cr["head"], cr["sv"], cr["oa"], cr["xa"], cr["nxt"],
                 qrow, table4, cr["aN"], cr["xz"]))
        cr2 = dict(cr, head=head_n, sv=sv_n, oa=oa_n, xa=xa_n, nxt=nxt_n,
                   aN=aN_n, xz=xz_n, fcnt=scal_o[0, _SC_FCNT],
                   iters=scal_o[0, _SC_ITER],
                   dmp=cr["dmp"] + scal_o[0, _SC_POPN],
                   dmf=cr["dmf"] + scal_o[0, _SC_FATN],
                   dmw=cr["dmw"] + scal_o[0, _SC_WRN])
        do_sw = scal_o[0, _SC_DOSW] > 0
        # Drain-deadlock guard: the in-kernel wave loop requires alive > 0
        # to run a wave, so a segment that starts with zero alive lanes
        # (e.g. a final wave finishing more than FL lanes at once, or a
        # refill batch entirely discarded on init) runs zero waves, leaves
        # _SC_DOSW = 0, and the outer carry would be a fixed point — the
        # device would spin forever.  The XLA queue body runs its flush
        # check unconditionally every iteration, so forcing the switch
        # whenever no lane is alive is parity-safe (flush + refill are
        # no-ops when there is nothing to do, and the outer cond then
        # terminates the loop).
        alive_n = jnp.any(sv_n[_SV_MODE] != MODE_DONE)
        do_sw = do_sw | ~alive_n
        return jax.lax.cond(do_sw, switch_wrap, lambda c: dict(c), cr2)

    # ---- initial carry (same packing as run_loop_resident + queue keys)
    sv0 = jnp.stack(
        [state["mode"], state["best_score"], state["max_diff"],
         state["num_best"], state["n_alns"],
         state["overflow"].astype(jnp.int32), state["n_open"],
         state["n_pushed"], state["x_cnt"], state["x_j"], state["x_node"],
         state["x_m1"], state["x_m2"]]
        + [jnp.zeros((B,), jnp.int32)] * (NSV - 13), axis=0)
    oa0 = jnp.concatenate(
        [state["o_L"].T, state["o_U"].T, state["o_score"].T,
         state["o_len"].T, state["o_node"].T, state["o_m1"].T,
         state["o_snp"].T], axis=0)
    xa0 = jnp.concatenate([state["x_L"].T, state["x_U"].T], axis=0)
    head0 = state["head"].T
    row_b = jnp.arange(S.NB, dtype=jnp.int32)[:, None]
    b0 = jnp.min(jnp.where(head0 >= 0, row_b, S.NB), axis=0)
    node0 = jnp.sum(jnp.where(row_b == b0[None, :], head0, 0), axis=0,
                    dtype=jnp.int32)
    nxt0 = jnp.zeros((S.NXW, B), jnp.int32).at[0].set(node0)
    carry = dict(aN=state["aN"], head=head0, sv=sv0, oa=oa0, xa=xa0,
                 nxt=nxt0, fcnt=state["fcnt"], iters=state["iters"],
                 xz=jnp.zeros((4 * max(S.XCAP, 2), B), jnp.int32),
                 dmp=jnp.int32(0), dmf=jnp.int32(0), dmw=jnp.int32(0))
    carry.update({k: state[k] for k in qkeys})
    carry["rcx"], carry["dnw"], carry["dsw"] = _lane_tables(
        S, B, state["rc"], state["len"], state["D"], state["Ds"])

    carry = jax.lax.while_loop(cond, body, carry)

    out = dict(state)
    sv = carry["sv"]
    out.update(
        aN=carry["aN"], head=carry["head"].T,
        mode=sv[_SV_MODE], n_alns=sv[_SV_NALN],
        overflow=sv[_SV_OVER] != 0, n_pushed=sv[_SV_NPUSH],
        n_work=sv[_SV_NWORK], ovwhy=sv[_SV_OVWHY],
        iters=carry["iters"], fcnt=carry["fcnt"],
        dma_pop=carry["dmp"], dma_fat=carry["dmf"], dma_wr=carry["dmw"],
    )
    out.update({k: carry[k] for k in qkeys})
    return out


def _resident_call(S: _Static, kern, aN_shape, B, args):
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pltpu.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, 16), jnp.int32),          # scal
        jax.ShapeDtypeStruct((S.NB, B), jnp.int32),        # head
        jax.ShapeDtypeStruct((NSV, B), jnp.int32),         # sv
        jax.ShapeDtypeStruct((7 * S.ACAP, B), jnp.int32),  # oa
        jax.ShapeDtypeStruct((2 * S.KX, B), jnp.int32),    # xa
        jax.ShapeDtypeStruct((S.NXW, B), jnp.int32),       # nxt
        jax.ShapeDtypeStruct(aN_shape, jnp.int32),         # arena
        jax.ShapeDtypeStruct(
            (4 * max(S.XCAP, 2), B) if S.RING else (8, B),
            jnp.int32),                                    # xz carry
    ]
    out_specs = [sspec, vspec, vspec, vspec, vspec, vspec, aspec, vspec]
    scratch = [
        pltpu.VMEM((B, S.ROWW), jnp.int32),                # popbuf
        pltpu.VMEM((S.RQ * B, S.FATW), jnp.int32),         # fatbuf
        pltpu.VMEM((B, S.ROWW), jnp.int32),                # framebuf
        pltpu.VMEM((_pad8(max(10 + 2 * S.KX, S.RQ, 8)), B),
                   jnp.int32),                             # stage
        pltpu.SMEM((_pad8(max(10 + 2 * S.KX, S.RQ, 8)), B),
                   jnp.int32),                             # sidx
        pltpu.VMEM((4 * max(S.XCAP, 2), B), jnp.int32),    # xz scratch
        pltpu.SemaphoreType.DMA(()),                       # psem
        pltpu.SemaphoreType.DMA(()),                       # fsem
        pltpu.SemaphoreType.DMA(()),                       # wsem
        pltpu.SemaphoreType.DMA(()),                       # ssem
    ]
    return pl.pallas_call(
        kern,
        in_specs=[sspec, vspec, vspec, vspec, vspec, vspec,
                  vspec, vspec, vspec, vspec, vspec, vspec, aspec, aspec,
                  vspec],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases={13: 6},
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the default 16 MB scoped-vmem limit is conservative; the
            # resident kernel's working set at B=1024 with xcap=128 is
            # ~17 MB (fatbuf + xz planes + lane tables)
            vmem_limit_bytes=int(__import__("os").environ.get(
                "BWBBLE_VMEM_MB", "64")) * 1024 * 1024),
    )(*args)


def _lane_tables(S: _Static, B, rc_a, len_a, D_a, Ds_a):
    """Per-read lookup tables in kernel lane-major layout: read chars
    [RCW, B] (row Lmax = length), D bounds [2*HD, B], seed-D [2*HS, B]."""
    rcx = jnp.concatenate(
        [rc_a.astype(jnp.int32).T,
         jnp.zeros((S.RCW - S.Lmax, B), jnp.int32)
            .at[0].set(len_a.astype(jnp.int32))], axis=0)
    dnw = jnp.concatenate(
        [D_a[:, :, 0].T, jnp.zeros((S.HD - 1 - S.TD, B), D_a.dtype),
         D_a[:, :, 1].T, jnp.zeros((S.HD - 1 - S.TD, B), D_a.dtype)],
        axis=0).astype(jnp.int32)
    dsw = jnp.concatenate(
        [Ds_a[:, :, 0].T, jnp.zeros((S.HS - 1 - S.TS, B), Ds_a.dtype),
         Ds_a[:, :, 1].T, jnp.zeros((S.HS - 1 - S.TS, B), Ds_a.dtype)],
        axis=0).astype(jnp.int32)
    return rcx, dnw, dsw


# --------------------------------------------------------------------------
# glue: the while_loop around the kernel
# --------------------------------------------------------------------------

def run_loop(didx, state, params, cfg, B, Lmax, NROOT, queued_ctx=None):
    """Pallas-backed replacement for the XLA while_loop of _search (int32,
    multiref, NROOT == 1).  Takes and returns the state dict
    engine/inexact.py builds, so init and output assembly are shared.

    queued_ctx (continuous batching): dict(switch_step=<the XLA flush/
    refill closure>, NR=..., FL=...).  The kernel runs every iteration;
    the switch fires in a rarely-taken lax.cond whose branch converts the
    lane-major carry to the dict layout, reuses the parity-tested XLA
    switch_step (flush + ring path walk + refill), and converts back —
    conversion cost is ~20 small transposes amortized over the ~B/FL
    iterations between flushes."""
    S = _Static(params, cfg, B, Lmax, NROOT)
    QU = queued_ctx is not None
    S.RING = QU
    NAREN = state["aN"].shape[0]
    qkeys = ("rc", "len", "D", "Ds", "rtN", "cur", "counter", "flushed",
             "start_f", "q_alns", "q_meta", "q_paths")

    B0 = B
    for cand in (256, 128):
        if B % cand == 0:
            B0 = min(B, cand)
            break
    grid = (B // B0,)

    rc = state["rc"]
    lengths_v = state["len"]
    D, Ds = state["D"], state["Ds"]
    rtN = state["rtN"]
    TDm1 = D.shape[1] - 1
    TSm1 = Ds.shape[1] - 1
    assert TDm1 == S.TD and TSm1 == S.TS, (TDm1, S.TD, TSm1, S.TS)
    lane_iota = jnp.arange(B, dtype=jnp.int32)
    length32 = didx.length.astype(jnp.int32)
    len_m1 = length32 - 1
    carrv = jnp.concatenate([didx.Carr.astype(jnp.int32),
                             jnp.zeros((15,), jnp.int32)]).reshape(32, 1)

    bspec = lambda w: pl.BlockSpec((w, B0), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    if S.FAT:
        rows_specs = [pl.BlockSpec((S.RQ, B0, S.FATW),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),   # fat rows
                      bspec(S.SUBW)]                           # sub-slab ids
        tbl = didx.table
        padr = (-tbl.shape[0]) % S.FATB
        if padr:
            tbl = jnp.pad(tbl, ((0, padr), (0, 0)))
        table4 = tbl.reshape(-1, S.FATW)       # FATB blocks per fat row
    else:
        rows_specs = [bspec(S.RQ * S.W)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # scal
        pl.BlockSpec((32, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                 # carr slab
        *rows_specs, bspec(4),
        bspec(S.RCW), bspec(2 * S.HD), bspec(2 * S.HS),
        bspec(S.NB), bspec(NSV), bspec(7 * S.ACAP), bspec(2 * S.KX),
    ]

    def lane_tables(rc_a, len_a, D_a, Ds_a):
        """_lane_tables, built once per launch (and re-built in the rare
        queue-refill cond branch) — the per-iteration XLA one-hot picks
        over [B, L, 2] lowered to a 142 us/iter kLoop fusion, 80% of the
        loop."""
        return _lane_tables(S, B, rc_a, len_a, D_a, Ds_a)
    out_shapes = [
        jax.ShapeDtypeStruct((S.NB, B), jnp.int32),            # head
        jax.ShapeDtypeStruct((NSV, B), jnp.int32),             # sv
        jax.ShapeDtypeStruct((7 * S.ACAP, B), jnp.int32),      # oa
        jax.ShapeDtypeStruct((2 * S.KX, B), jnp.int32),        # xa
        jax.ShapeDtypeStruct((128, B), jnp.int32),             # cnd
        jax.ShapeDtypeStruct((S.NXW, B), jnp.int32),           # nxt
    ]
    out_specs = [bspec(S.NB), bspec(NSV), bspec(7 * S.ACAP),
                 bspec(2 * S.KX), bspec(128), bspec(S.NXW)]
    kern = functools.partial(_kernel_body, S)

    def carry_to_dict(cr):
        """Lane-major carry -> the dict layout switch_step expects."""
        sv, oa = cr["sv"], cr["oa"]
        d = dict(
            aN=cr["aN"], head=cr["head"].T,
            mode=sv[_SV_MODE], best_score=sv[_SV_BEST],
            max_diff=sv[_SV_MAXD], num_best=sv[_SV_NBEST],
            n_alns=sv[_SV_NALN], overflow=sv[_SV_OVER] != 0,
            n_open=sv[_SV_NOPEN], n_pushed=sv[_SV_NPUSH],
            x_cnt=sv[_SV_XCNT], x_j=sv[_SV_XJ], x_node=sv[_SV_XNODE],
            x_m1=sv[_SV_XM1], x_m2=sv[_SV_XM2],
            o_L=oa[0 * S.ACAP:1 * S.ACAP].T,
            o_U=oa[1 * S.ACAP:2 * S.ACAP].T,
            o_score=oa[2 * S.ACAP:3 * S.ACAP].T,
            o_len=oa[3 * S.ACAP:4 * S.ACAP].T,
            o_node=oa[4 * S.ACAP:5 * S.ACAP].T,
            o_m1=oa[5 * S.ACAP:6 * S.ACAP].T,
            o_snp=oa[6 * S.ACAP:7 * S.ACAP].T,
            x_L=cr["xa"][:S.KX].T, x_U=cr["xa"][S.KX:].T,
            pf=sv[_SV_PF], fcnt=cr["fcnt"], iters=cr["iters"])
        d.update({k: cr[k] for k in qkeys})
        return d

    def dict_to_carry(d, cr):
        """Repack switch_step's dict back into the carry; recompute the
        pop-node feed-forward (refilled lanes have fresh heads).  Rows
        13+ (diagnostics + the per-lane pop clock) carry through from the
        pre-switch sv — switch_step never modifies them."""
        base13 = jnp.stack(
            [d["mode"], d["best_score"], d["max_diff"], d["num_best"],
             d["n_alns"], d["overflow"].astype(jnp.int32), d["n_open"],
             d["n_pushed"], d["x_cnt"], d["x_j"], d["x_node"], d["x_m1"],
             d["x_m2"]], axis=0)
        sv = jnp.concatenate([base13, cr["sv"][13:]], axis=0)
        oa = jnp.concatenate(
            [d["o_L"].T, d["o_U"].T, d["o_score"].T, d["o_len"].T,
             d["o_node"].T, d["o_m1"].T, d["o_snp"].T], axis=0)
        xa = jnp.concatenate([d["x_L"].T, d["x_U"].T], axis=0)
        headT = d["head"].T
        rb = _iota((S.NB, B), 0)
        b0 = jnp.min(jnp.where(headT >= 0, rb, S.NB), axis=0)
        node0 = jnp.sum(jnp.where(rb == b0[None, :], headT, 0), axis=0,
                        dtype=jnp.int32)
        out = dict(cr, aN=d["aN"], head=headT, sv=sv, oa=oa, xa=xa,
                   nxt=cr["nxt"].at[0].set(node0), fcnt=d["fcnt"])
        out.update({k: d[k] for k in qkeys})
        out["rcx"], out["dnw"], out["dsw"] = lane_tables(
            d["rc"], d["len"], d["D"], d["Ds"])
        return out

    if QU:
        switch_fn = queued_ctx["switch_step"]
        NR_q = int(queued_ctx["NR"])
        FL_q = int(queued_ctx["FL"])

        def switch_wrap(cr):
            return dict_to_carry(switch_fn(carry_to_dict(cr)), cr)

    def step(carry):
        if QU:
            # ring-age overflow + flush/refill gating (mirrors the XLA
            # body(); parity-tested there).  Age = the lane's own pop
            # clock since refill (per-read exact)
            sv = carry["sv"]
            age = sv[_SV_PF] - carry["start_f"]
            ring_over = (sv[_SV_MODE] != MODE_DONE) & (age >= S.NFRAME)
            sv = sv.at[_SV_MODE].set(
                jnp.where(ring_over, MODE_DONE, sv[_SV_MODE]))
            sv = sv.at[_SV_OVER].set(
                sv[_SV_OVER] | ring_over.astype(jnp.int32))
            carry = dict(carry, sv=sv)
            fin = (sv[_SV_MODE] == MODE_DONE) & ~carry["flushed"]
            nfin = jnp.sum(fin, dtype=jnp.int32)
            drain = ((carry["counter"] >= NR_q)
                     | ~jnp.any(sv[_SV_MODE] != MODE_DONE))
            urg = max(2, S.NFRAME - (B // FL_q) - 2)
            urgent = jnp.any(fin & (age >= urg))
            do_sw = (nfin >= FL_q) | ((nfin > 0) & drain) | urgent
            carry = jax.lax.cond(do_sw, switch_wrap,
                                 lambda c: dict(c), carry)
        aN = carry["aN"]
        nxt = carry["nxt"]
        node = nxt[0]
        rtN_c = carry["rtN"] if QU else rtN

        # arena pop-row gather + node unpack (roots from rtN)
        nn = jnp.maximum(node - S.NROOT, 0)
        fq = nn // S.NSLOT
        s_ = nn - fq * S.NSLOT
        f = (fq % S.NFRAME) if QU else fq
        flat = aN.reshape(NAREN * B, S.ROWW)
        rowv = jnp.take(flat, f * B + lane_iota, axis=0)       # [B, ROWW]
        slots = rowv[:, :S.NSLOT * 4].reshape(B, S.NSLOT, 4)
        sl1h = jnp.arange(S.NSLOT, dtype=jnp.int32)[None, :] == s_[:, None]
        aV = jnp.sum(jnp.where(sl1h[:, :, None], slots, 0), axis=1,
                     dtype=jnp.int32)                          # [B, 4]
        if S.NROOT == 1:
            rootv = rtN_c[:, 0]
        else:
            # seeded search (-P): NROOT precalc root rows per lane
            # (engine/inexact.py read_init; align.c:200-238)
            rid = jnp.clip(node, 0, S.NROOT - 1)
            rootv = jnp.take_along_axis(
                rtN_c, rid[:, None, None], axis=1)[:, 0]
        node4 = jnp.where((node < S.NROOT)[:, None], rootv, aV)
        eL, eU, m1 = node4[:, 0], node4[:, 1], node4[:, 2]

        # rank-table row gather in stream order, transposed lane-major
        blk_of = lambda i: (jnp.clip(i, 0, jnp.maximum(len_m1 - 1, 0))
                            // BLK).astype(jnp.int32)
        kAll = jnp.concatenate(
            [blk_of(eL - 1)[None], blk_of(eU)[None],
             nxt[1:1 + 2 * S.KX]], axis=0)                     # [RQ, B]
        # NOTE (profiled, v5e): with the lane-major [RQ*32, B] feed this
        # gather was 57% of the iteration at ~9 ns PER ROW — XLA folds the
        # transpose INTO the gather as scattered 4-byte stores, and an
        # optimization_barrier does not change its layout choice.  The
        # FAT path instead gathers 512-byte fat rows (minor dim = the
        # 128-lane tile, so the gather keeps its bulk row-copy layout)
        # and moves the transpose + 32-word sub-slab pick inside the
        # kernel's VMEM.
        if S.FAT:
            fsh = S.FATB.bit_length() - 1
            fat = jnp.take(table4, (kAll >> fsh).reshape(-1), axis=0) \
                     .reshape(S.RQ, B, S.FATW)
            subm = jnp.concatenate(
                [kAll & (S.FATB - 1),
                 jnp.zeros((S.SUBW - S.RQ, B), jnp.int32)], axis=0)
            rows_args = (fat, subm)
        else:
            rows = jnp.take(didx.table, kAll.reshape(-1), axis=0)
            rows_args = (rows.reshape(S.RQ, B, S.W).transpose(0, 2, 1)
                         .reshape(S.RQ * S.W, B),)

        # per-lane lookup tables (read chars, D/D_seed bounds): queue mode
        # refreshes them at refill, fixed mode closes over one build
        if QU:
            rcx_t, dnw_t, dsw_t = carry["rcx"], carry["dnw"], carry["dsw"]
        else:
            rcx_t, dnw_t, dsw_t = rcx0, dnw0, dsw0

        scal = jnp.stack([carry["fcnt"], length32,
                          didx.sa0.astype(jnp.int32),
                          jnp.int32(0)]).reshape(1, 4)

        head_n, sv_n, oa_n, xa_n, cnd, nxt_n = pl.pallas_call(
            kern, grid=grid, out_shape=out_shapes,
            in_specs=in_specs, out_specs=out_specs,
            interpret=INTERPRET,
        )(scal, carrv, *rows_args, node4.T, rcx_t, dnw_t, dsw_t,
          carry["head"], carry["sv"], carry["oa"], carry["xa"])

        # frame write: interleave [4*NSLOT] node words + parent id
        candN = jnp.stack(
            [cnd[0:S.NSLOT], cnd[S.NSLOT:2 * S.NSLOT],
             cnd[2 * S.NSLOT:3 * S.NSLOT], cnd[3 * S.NSLOT:4 * S.NSLOT]],
            axis=1).reshape(4 * S.NSLOT, B)
        frow = jnp.concatenate(
            [candN, cnd[4 * S.NSLOT:4 * S.NSLOT + 1],
             jnp.zeros((S.ROWW - 1 - 4 * S.NSLOT, B), jnp.int32)],
            axis=0).T                                          # [B, ROWW]
        any_pop = jnp.any(sv_n[_SV_POPPED] > 0)
        if QU:
            # per-lane ring slots from the lane's pop clock BEFORE this
            # wave's increment; popped lanes only (engine/inexact.py
            # dfs_step RING write — a garbage write would clobber an
            # age==NFRAME overflow lane's oldest live frame)
            wslot_b = carry["sv"][_SV_PF] % S.NFRAME
            popped_b = sv_n[_SV_POPPED] > 0
            cur_rows = aN[wslot_b, lane_iota]
            aN = aN.at[wslot_b, lane_iota].set(
                jnp.where(popped_b[:, None], frow, cur_rows))
        else:
            wslot = jnp.minimum(carry["fcnt"], S.NFRAME)
            aN = jax.lax.dynamic_update_slice(
                aN, frow[None], (wslot, jnp.int32(0), jnp.int32(0)))
        return dict(carry, aN=aN, head=head_n, sv=sv_n, oa=oa_n, xa=xa_n,
                    nxt=nxt_n,
                    fcnt=carry["fcnt"] + any_pop.astype(jnp.int32),
                    iters=carry["iters"] + 1)

    # ---- pack the dict state into the lane-major carry
    sv0 = jnp.stack(
        [state["mode"], state["best_score"], state["max_diff"],
         state["num_best"], state["n_alns"],
         state["overflow"].astype(jnp.int32), state["n_open"],
         state["n_pushed"], state["x_cnt"], state["x_j"], state["x_node"],
         state["x_m1"], state["x_m2"]]
        + [jnp.zeros((B,), jnp.int32)] * (NSV - 13), axis=0)
    oa0 = jnp.concatenate(
        [state["o_L"].T, state["o_U"].T, state["o_score"].T,
         state["o_len"].T, state["o_node"].T, state["o_m1"].T,
         state["o_snp"].T], axis=0)
    xa0 = jnp.concatenate([state["x_L"].T, state["x_U"].T], axis=0)
    head0 = state["head"].T                                    # [NB, B]
    row_b = jnp.arange(S.NB, dtype=jnp.int32)[:, None]
    b0 = jnp.min(jnp.where(head0 >= 0, row_b, S.NB), axis=0)
    node0 = jnp.sum(jnp.where(row_b == b0[None, :], head0, 0), axis=0,
                    dtype=jnp.int32)
    nxt0 = jnp.zeros((S.NXW, B), jnp.int32).at[0].set(node0)

    carry = dict(aN=state["aN"], head=head0, sv=sv0, oa=oa0, xa=xa0,
                 nxt=nxt0, fcnt=state["fcnt"], iters=state["iters"])
    if QU:
        carry.update({k: state[k] for k in qkeys})
        carry["rcx"], carry["dnw"], carry["dsw"] = lane_tables(
            state["rc"], state["len"], state["D"], state["Ds"])
    else:
        rcx0, dnw0, dsw0 = lane_tables(rc, lengths_v, D, Ds)

    def cond(cr):
        alive = jnp.any(cr["sv"][_SV_MODE] != MODE_DONE)
        if QU:
            alive = alive | (cr["counter"] < NR_q) \
                | jnp.any((cr["sv"][_SV_MODE] == MODE_DONE)
                          & ~cr["flushed"] & (lane_iota < NR_q))
        return alive & (cr["iters"] < cfg.max_iters)

    carry = jax.lax.while_loop(cond, step, carry)

    # ---- unpack back into the dict layout _search's assembly expects
    out = dict(state)
    sv = carry["sv"]
    oa = carry["oa"]
    out.update(
        aN=carry["aN"], head=carry["head"].T,
        mode=sv[_SV_MODE], best_score=sv[_SV_BEST],
        max_diff=sv[_SV_MAXD], num_best=sv[_SV_NBEST],
        n_alns=sv[_SV_NALN], overflow=sv[_SV_OVER] != 0,
        n_open=sv[_SV_NOPEN], n_pushed=sv[_SV_NPUSH],
        x_cnt=sv[_SV_XCNT], x_j=sv[_SV_XJ], x_node=sv[_SV_XNODE],
        x_m1=sv[_SV_XM1], x_m2=sv[_SV_XM2],
        o_L=oa[0 * S.ACAP:1 * S.ACAP].T, o_U=oa[1 * S.ACAP:2 * S.ACAP].T,
        o_score=oa[2 * S.ACAP:3 * S.ACAP].T,
        o_len=oa[3 * S.ACAP:4 * S.ACAP].T,
        o_node=oa[4 * S.ACAP:5 * S.ACAP].T,
        o_m1=oa[5 * S.ACAP:6 * S.ACAP].T,
        o_snp=oa[6 * S.ACAP:7 * S.ACAP].T,
        x_L=carry["xa"][:S.KX].T, x_U=carry["xa"][S.KX:].T,
        n_work=sv[_SV_NWORK], ovwhy=sv[_SV_OVWHY],
        iters=carry["iters"], fcnt=carry["fcnt"],
    )
    if QU:
        out.update({k: carry[k] for k in qkeys})
    return out
