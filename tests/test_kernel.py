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
    finally:
        PK.INTERPRET = False

    for k in ("n_alns", "o_L", "o_U", "o_score", "o_len", "o_node",
              "o_mm", "o_go", "o_ge", "o_snp", "o_plen", "overflow",
              "paths", "n_pushed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)
