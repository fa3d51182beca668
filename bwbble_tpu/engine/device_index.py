"""Device-resident FM-index layout.

Redesigned for TPU memory access (not a port of the reference's packed-word
layout): the BWT lives in HBM as one int8 code per position, tiled into
rows of OCC_INTERVAL (=128, conveniently the TPU lane width) so one gather
fetches the checkpoint-aligned block a rank query needs; occurrence
checkpoints are an int32 [num_blocks, 16] plane gathered alongside.

A bit-plane layout (4 uint32 words x 4 planes per block + popcount) is
provided for the Pallas fast path; both layouts carry identical information.

Indices are int32: genomes up to 2^31 positions (fwd+RC) per shard.  Larger
references are handled by range-sharding the index across devices (see
bwbble_tpu.parallel), keeping per-shard offsets within int32.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bwbble_tpu import constants as C
from bwbble_tpu.index.fmindex import FMIndex

BLK = C.OCC_INTERVAL  # 128 positions per block


@partial(jax.tree_util.register_dataclass,
         data_fields=["table", "Carr", "sa_samples", "length", "sa0"],
         meta_fields=["tp_axis"])
@dataclasses.dataclass
class DeviceIndex:
    # One fused 128-byte row per BWT block, so a rank query is a single
    # row gather (TPU gathers are latency-bound; splitting planes and
    # checkpoints doubled the gather count for nothing):
    #   cols 0..15  — bit planes: table[k, 4*t + w] holds bit t of the codes
    #                 at positions w*32 .. w*32+31 of block k (LSB-first).
    #                 XNOR-AND + population_count answers a 16-char rank with
    #                 64 popcounts (~10x less VPU work than an int8 one-hot
    #                 scan, 0.5 B/position).
    #   cols 16..31 — occurrence-checkpoint counts for the 16 symbols.
    table: jax.Array       # int32 [num_blocks, 32]
    Carr: jax.Array        # int32 [17] prefix counts
    sa_samples: jax.Array  # int32 [num_sa] SA values every SA_INTERVAL
    length: jax.Array      # int32 scalar: BWT length
    sa0: jax.Array         # int32 scalar: sentinel row
    # When set (inside shard_map), `table` holds only this device's
    # contiguous block range; rank gathers mask misses and psum over this
    # mesh axis (the TP analog: index range-sharded across chips, rank
    # queries answered by one all-reduce over ICI).  Checkpoint counts are
    # global cumulative ranks, so shards answer directly.
    tp_axis: str | None = None

    @property
    def num_blocks(self) -> int:
        return self.table.shape[0]


def build_planes(blocks: np.ndarray) -> np.ndarray:
    """Pack int8 code blocks [NB, 128] into bit planes [NB, 16] int32."""
    nb = blocks.shape[0]
    codes = blocks.astype(np.uint32).reshape(nb, 4, 32)   # [NB, word, bit pos]
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))[None, None, :]
    planes = np.zeros((nb, 4, 4), dtype=np.uint32)        # [NB, bit t, word w]
    for t in range(4):
        bit = (codes >> np.uint32(t)) & np.uint32(1)
        planes[:, t, :] = (bit * weights).sum(axis=2, dtype=np.uint32)
    return planes.reshape(nb, 16).view(np.int32)


def from_fmindex(idx: FMIndex) -> DeviceIndex:
    if idx.length >= 2**31:
        raise ValueError(
            "single-shard DeviceIndex requires length < 2^31; "
            "use a range-sharded index for whole-genome scale")
    num_blocks = -(-idx.length // BLK)
    blocks = np.zeros((num_blocks, BLK), dtype=np.int8)
    flat = blocks.reshape(-1)
    flat[:idx.length] = idx.bwt
    table = np.concatenate(
        [build_planes(blocks).view(np.int32),
         idx.occ.astype(np.int32)], axis=1)
    return DeviceIndex(
        table=jnp.asarray(table),
        Carr=jnp.asarray(idx.Carr.astype(np.int32)),
        sa_samples=jnp.asarray(idx.sa.astype(np.int32)),
        length=jnp.int32(idx.length),
        sa0=jnp.int32(idx.sa0),
    )
