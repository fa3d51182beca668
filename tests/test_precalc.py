"""Precalc seed-table tests (C12): device build vs gold oracle, `.pre`
codec roundtrip, and -P alignment parity gold vs device."""

import numpy as np
import pytest

from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.align.pipeline import align_reads_gold
from bwbble_tpu.align.precalc import (
    PrecalcTable, build_precalc_device, build_precalc_gold, load_pre,
    read_indices, store_pre,
)
from bwbble_tpu.engine.device_index import from_fmindex
from bwbble_tpu.engine.inexact import EngineConfig
from bwbble_tpu.engine.pipeline import align_reads_device
from bwbble_tpu.gold.engine import read2index


K = 4  # small table length for tests (the real -P uses 12)


@pytest.fixture(scope="module")
def table_pair(small_world):
    idx = small_world["idx"]
    params = AlnParams(precalc_len=K)
    gold = build_precalc_gold(idx, params, k=K)
    dev = build_precalc_device(idx, from_fmindex(idx), params, k=K,
                               K=8, max_level_full=2, sub_batch=64)
    return gold, dev


def test_device_build_matches_gold(table_pair):
    gold, dev = table_pair
    np.testing.assert_array_equal(dev.cnt, gold.cnt)
    np.testing.assert_array_equal(dev.off, gold.off)
    np.testing.assert_array_equal(dev.L, gold.L)
    np.testing.assert_array_equal(dev.U, gold.U)


def test_pre_codec_roundtrip(tmp_path, table_pair):
    gold, _ = table_pair
    path = str(tmp_path / "t.pre")
    store_pre(path, gold)
    back = load_pre(path, num_entries=4 ** K)
    np.testing.assert_array_equal(back.cnt, gold.cnt)
    np.testing.assert_array_equal(back.L, gold.L)
    np.testing.assert_array_equal(back.U, gold.U)


def test_read_indices_matches_gold(small_world):
    reads = small_world["reads"]
    ri = read_indices(reads.rc[:20], reads.lengths[:20], k=K)
    for b in range(20):
        assert ri[b] == read2index(reads.rc[b], int(reads.lengths[b]), k=K)


def test_align_precalc_gold_vs_device(small_world, table_pair):
    gold_table, _ = table_pair
    idx = small_world["idx"]
    reads = small_world["reads"]
    import dataclasses
    from bwbble_tpu.formats.fastq import Reads
    sub = Reads(names=reads.names[:12], seq=reads.seq[:12],
                rc=reads.rc[:12], qual=reads.qual[:12],
                lengths=reads.lengths[:12])
    params = AlnParams(max_diff=2, use_precalc=True, precalc_len=K,
                       batch_size=12)
    g = align_reads_gold(idx, sub, params, precalc=gold_table)
    cfg = EngineConfig(cap=16384, acap=32, kx=8, max_iters=100_000)
    d = align_reads_device(idx, from_fmindex(idx), sub, params, cfg,
                           precalc=gold_table, seed_slots=8)
    assert len(g) == len(d)
    for a, b in zip(g, d):
        assert [(x.L, x.U, x.score, x.aln_length, x.path) for x in a] == \
               [(x.L, x.U, x.score, x.aln_length, x.path) for x in b]
