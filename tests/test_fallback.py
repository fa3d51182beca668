"""Host gold fallback under capacity overflow.

Deliberately tiny engine capacities force reads onto the gold engine
(VERDICT r1 item 7: the degradation path must be measured and parallel).
Checks: results stay byte-identical to the all-gold run, the fallback
counter reports the storm, and -t > 1 (fork pool) produces identical
results to serial fallback.
"""

import numpy as np

from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.align.pipeline import align_reads_gold
from bwbble_tpu.engine.device_index import from_fmindex
from bwbble_tpu.engine.inexact import EngineConfig
from bwbble_tpu.engine.pipeline import align_reads_device, gold_fallback_many


def test_overflow_storm_matches_gold(small_world):
    idx = small_world["idx"]
    didx = from_fmindex(idx)
    reads = small_world["reads"]
    params = AlnParams(max_diff=2, batch_size=64)
    # acap=1 overflows any read with >1 recorded alignment; cap small too
    cfg = EngineConfig(cap=1024, acap=1, kx=1, max_iters=50_000)

    stats: dict = {}
    dev = align_reads_device(idx, didx, reads, params, cfg, d_cap=16,
                             stats=stats, sort_reads=False)
    gold = align_reads_gold(idx, reads, params)
    assert stats["fallback_reads"] > 0, "expected an overflow storm"
    assert dev == gold


def test_parallel_fallback_matches_serial(small_world):
    idx = small_world["idx"]
    reads = small_world["reads"]
    params = AlnParams(max_diff=2)
    sel = list(range(12))
    serial = gold_fallback_many(idx, reads, sel, params, None, n_threads=1)
    pooled = gold_fallback_many(idx, reads, sel, params, None, n_threads=3)
    assert serial == pooled
    p2 = AlnParams(max_diff=2, n_threads=4)
    didx = from_fmindex(idx)
    cfg = EngineConfig(cap=1024, acap=1, kx=1, max_iters=50_000)
    stats: dict = {}
    dev = align_reads_device(idx, didx, reads, p2, cfg, d_cap=16,
                             stats=stats, sort_reads=False)
    gold = align_reads_gold(idx, reads, p2)
    assert stats["fallback_reads"] > 0
    assert dev == gold
