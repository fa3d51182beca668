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
         data_fields=["blocks", "occ", "Carr", "sa_samples", "length", "sa0"],
         meta_fields=["tp_axis"])
@dataclasses.dataclass
class DeviceIndex:
    blocks: jax.Array      # int8  [num_blocks, 128] BWT codes, zero-padded tail
    occ: jax.Array         # int32 [num_blocks, 16] checkpoint ranks
    Carr: jax.Array        # int32 [17] prefix counts
    sa_samples: jax.Array  # int32 [num_sa] SA values every SA_INTERVAL
    length: jax.Array      # int32 scalar: BWT length
    sa0: jax.Array         # int32 scalar: sentinel row
    # When set (inside shard_map), `blocks`/`occ` hold only this device's
    # contiguous block range; rank gathers mask misses and psum over this
    # mesh axis (the TP analog: index range-sharded across chips, rank
    # queries answered by one all-reduce over ICI).  Checkpoint counts are
    # global cumulative ranks, so shards answer directly.
    tp_axis: str | None = None

    @property
    def num_blocks(self) -> int:
        return self.blocks.shape[0]


def from_fmindex(idx: FMIndex) -> DeviceIndex:
    if idx.length >= 2**31:
        raise ValueError(
            "single-shard DeviceIndex requires length < 2^31; "
            "use a range-sharded index for whole-genome scale")
    num_blocks = -(-idx.length // BLK)
    blocks = np.zeros((num_blocks, BLK), dtype=np.int8)
    flat = blocks.reshape(-1)
    flat[:idx.length] = idx.bwt
    return DeviceIndex(
        blocks=jnp.asarray(blocks),
        occ=jnp.asarray(idx.occ.astype(np.int32)),
        Carr=jnp.asarray(idx.Carr.astype(np.int32)),
        sa_samples=jnp.asarray(idx.sa.astype(np.int32)),
        length=jnp.int32(idx.length),
        sa0=jnp.int32(idx.sa0),
    )
