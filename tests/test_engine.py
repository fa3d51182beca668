"""Device-engine tests (CPU backend, small sizes to bound compile time):
rank kernels, exact search, D bounds, SA resolution, and full inexact-engine
parity against the gold model."""

import numpy as np
import pytest

import jax.numpy as jnp

from bwbble_tpu import constants as C
from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.align.pipeline import align_reads_gold
from bwbble_tpu.engine import device_index as DI
from bwbble_tpu.engine import rank as R
from bwbble_tpu.engine.dbound import calc_d, calc_d_1to1
from bwbble_tpu.engine.exact import exact_search, exact_search_1to1
from bwbble_tpu.engine.inexact import EngineConfig
from bwbble_tpu.engine.pipeline import align_reads_device
from bwbble_tpu.formats.fastq import Reads, parse_fastq_bytes
from bwbble_tpu.gold import engine as G
from bwbble_tpu.index import FMIndex


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    # small genome with IUPAC codes and separators
    seq = rng.integers(1, 16, size=6000).astype(np.uint8)
    acgt = np.array([15, 3, 7, 1], dtype=np.uint8)
    seq[:5000] = acgt[rng.integers(0, 4, size=5000)]
    seq[2500] = 0
    idx = FMIndex.build(seq)
    didx = DI.from_fmindex(idx)
    # simulated reads: substrings of the ACGT half with mismatches
    reads = []
    names = []
    L = 36
    chars = "AGCT"
    for r in range(24):
        s = int(rng.integers(0, 4000))
        frag = [chars[int(C.NT4_TABLE[C.IUPAC_CHAR[x]])] if C.IUPAC_CHAR[x] in b"ACGT"
                else "A" for x in seq[s:s + L]]
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, L))
            frag[p] = chars[int(rng.integers(0, 4))]
        if r % 7 == 3:
            frag[int(rng.integers(0, L))] = "N"
        reads.append("".join(frag))
        names.append(f"r{r}")
    fq = "".join(f"@{n}\n{s}\n+\n{'I' * L}\n" for n, s in zip(names, reads))
    return {"idx": idx, "didx": didx,
            "reads": parse_fastq_bytes(fq.encode())}


def test_rank_all_variants(world):
    idx, didx = world["idx"], world["didx"]
    rng = np.random.default_rng(1)
    pos = np.concatenate([rng.integers(0, idx.length - 1, size=60),
                          [-1, 0, 127, 128, idx.length - 1, idx.sa0]]
                         ).astype(np.int32)
    dfs = np.asarray(R.rank_all_dfs(didx, jnp.asarray(pos), 1))
    ex = np.asarray(R.rank_all_exact(didx, jnp.asarray(pos), 0))
    actg = np.asarray(R.rank_actg_dfs(didx, jnp.asarray(pos), 1))
    for t, i in enumerate(pos):
        i = int(i)
        assert np.array_equal(dfs[t, 1:], idx.O_alphabet(i, 1)[1:])
        assert np.array_equal(actg[t, 1:5], idx.O_actg_alphabet(i, 1)[1:5])
        for c in range(1, 16):
            want = (idx.Carr[c] + idx.O(c, i)) if i != idx.length - 1 \
                else idx.Carr[c] + idx.Carr[c + 1] - idx.Carr[c]
            assert ex[t, c] == want


def test_rank1_and_sa(world):
    idx, didx = world["idx"], world["didx"]
    rng = np.random.default_rng(2)
    pos = rng.integers(-1, idx.length, size=80).astype(np.int32)
    cs = rng.integers(0, 16, size=80).astype(np.int32)
    got = np.asarray(R.rank1(didx, jnp.asarray(cs), jnp.asarray(pos)))
    for t in range(80):
        assert got[t] == idx.O(int(cs[t]), int(pos[t]))
    rows = rng.integers(0, idx.length, size=64).astype(np.int32)
    sa = np.asarray(R.sa_resolve(didx, jnp.asarray(rows)))
    for t, r in enumerate(rows):
        assert sa[t] == idx.SA(int(r))


def test_exact_search_parity(world):
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    p = AlnParams()
    Ls, Us, cnt, over = map(np.asarray, exact_search(
        didx, jnp.asarray(reads.seq), jnp.asarray(reads.lengths), K=16))
    for b in range(reads.count):
        if over[b]:
            continue
        gold = G.exact_match(idx, reads.seq[b], int(reads.lengths[b]), p)
        assert [[int(Ls[b, k]), int(Us[b, k])] for k in range(cnt[b])] == gold


def test_exact_1to1_parity(world):
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    p = AlnParams(is_multiref=False)
    L, U, alive = map(np.asarray, exact_search_1to1(
        didx, jnp.asarray(reads.seq), jnp.asarray(reads.lengths)))
    for b in range(reads.count):
        gold = G.exact_match(idx, reads.seq[b], int(reads.lengths[b]), p)
        if alive[b]:
            assert gold == [[int(L[b]), int(U[b])]]
        else:
            assert gold == []


def test_calc_d_parity(world):
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    for p, fn in [(AlnParams(), lambda s, l: calc_d(didx, s, l, K=24)),
                  (AlnParams(is_multiref=False),
                   lambda s, l: calc_d_1to1(didx, s, l))]:
        D, over = fn(jnp.asarray(reads.seq), jnp.asarray(reads.lengths))
        D, over = np.asarray(D), np.asarray(over)
        for b in range(reads.count):
            if over[b]:
                continue
            gold = G.calculate_d(idx, reads.seq[b], int(reads.lengths[b]), p)
            assert np.array_equal(D[b, :int(reads.lengths[b]) + 1], gold), b


@pytest.mark.parametrize("kwargs", [
    dict(max_diff=0), dict(max_diff=2), dict(max_diff=2, max_gapo=0),
    dict(max_diff=2, is_multiref=False), dict(max_diff=3, seed_length=20),
])
def test_inexact_engine_parity(world, kwargs):
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    params = AlnParams(batch_size=32, **kwargs)
    stats = {}
    dev = align_reads_device(idx, didx, reads, params,
                             EngineConfig(cap=8192, acap=32, kx=8),
                             d_cap=24, stats=stats)
    gold = align_reads_gold(idx, reads, params)
    assert dev == gold


@pytest.mark.parametrize("kwargs", [
    dict(max_diff=2), dict(max_diff=2, is_multiref=False),
    dict(max_diff=3, seed_length=20),
])
def test_queued_engine_parity(world, kwargs):
    """Continuous batching (lanes streaming a global read queue) must give
    bit-identical results to per-read batching and the gold engine."""
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    params = AlnParams(batch_size=8, **kwargs)   # 24 reads > 8 lanes
    cfg = EngineConfig(cap=16384, acap=32, kx=8, flush=4)
    dev_q = align_reads_device(idx, didx, reads, params, cfg, d_cap=24,
                               queued=True)
    gold = align_reads_gold(idx, reads, params)
    assert dev_q == gold


def test_queued_engine_parity_precalc(world):
    from bwbble_tpu.align.precalc import build_precalc_gold
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    params = AlnParams(batch_size=8, max_diff=2, use_precalc=True,
                       precalc_len=4)
    table = build_precalc_gold(idx, params, k=4)
    cfg = EngineConfig(cap=16384, acap=32, kx=8, flush=4)
    dev_q = align_reads_device(idx, didx, reads, params, cfg, d_cap=24,
                               queued=True, precalc=table, seed_slots=8)
    gold = align_reads_gold(idx, reads, params, precalc=table)
    assert dev_q == gold


def test_queued_ring_wrap_parity(world):
    """Tiny arena: the ring wraps many times across the queue and some
    reads exceed their per-read frame budget (overflow -> retry/fallback).
    Results must stay byte-identical to the gold engine, proving the ring
    clock, flush-time path walks, and per-read budgets are exact."""
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    params = AlnParams(batch_size=8, max_diff=2)
    # cap=1024 -> NFRAME ~ 43 frames: far below most reads' pop counts
    cfg = EngineConfig(cap=1024, acap=32, kx=8, flush=4)
    stats = {}
    dev_q = align_reads_device(idx, didx, reads, params, cfg, d_cap=24,
                               queued=True, stats=stats)
    gold = align_reads_gold(idx, reads, params)
    assert dev_q == gold


@pytest.mark.parametrize("kwargs", [
    dict(max_diff=1, max_gapo=7),                    # go field: 3 bits
    dict(max_diff=1, max_gape=15),                   # ge field: 4 bits
    dict(max_diff=2, mm_score=250, gapo_score=300),  # bucket-count bound
])
def test_extreme_params_route_to_gold(world, kwargs):
    """Parameters outside the device engine's packed domain (the reference
    accepts them, main.c:100-117) must route to gold, not crash."""
    idx, didx, reads = world["idx"], world["didx"], world["reads"]
    params = AlnParams(batch_size=32, **kwargs)
    stats = {}
    dev = align_reads_device(idx, didx, reads, params,
                             EngineConfig(cap=8192), stats=stats)
    gold = align_reads_gold(idx, reads, params)
    assert dev == gold
    assert stats.get("gold_routed") or stats.get("fallback_reads") == 0
