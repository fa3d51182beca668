"""Multi-chip execution: DP over reads x TP over the index, via shard_map.

The reference scales with OpenMP threads over a shared read-only index on one
node (align_reads_inexact_parallel, inexact_match.c:92-168).  The TPU-native
design replaces both the threads and the shared memory:

- **dp axis** — reads are data-parallel: each chip runs the lockstep engines
  on its own read shard.  No communication at all on this axis (matching the
  reference's embarrassingly-parallel structure).
- **tp axis** — the FM-index is range-sharded: each chip holds a contiguous
  range of BWT blocks + occ checkpoints (checkpoints store *global* ranks, so
  any shard answers its own positions directly).  A rank query gathers from
  exactly one shard; misses contribute zeros and one `psum` over tp
  reconstructs the row on every chip (engine.rank._take_rows).  This is the
  megatron-style layout: search state replicated along tp, index weights
  sharded, one ICI all-reduce per rank round.

Whole-genome fwd+RC (~6.4 G positions) exceeds int32 on one chip; tp-sharding
with per-shard-local block indices keeps every on-device index within int32
while the mesh covers the full genome.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bwbble_tpu.align.params import AlnParams
from bwbble_tpu.engine.device_index import DeviceIndex
from bwbble_tpu.engine.inexact import EngineConfig, inexact_search
from bwbble_tpu.engine.dbound import calc_d, calc_d_1to1
from bwbble_tpu.engine.rank import sa_resolve

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore
    _shard_map = _shard_map_mod.shard_map if hasattr(
        _shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
import inspect

_REP_KW = ("check_vma" if "check_vma"
           in inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(f, *, mesh, in_specs, out_specs):
    # Replication checking is disabled: outputs are value-replicated along tp
    # by construction (every tp member holds identical post-psum state), which
    # the static checker cannot prove.
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **{_REP_KW: False})


def make_mesh(dp: int, tp: int = 1, devices=None) -> Mesh:
    """A (dp, tp) device mesh; dp*tp must not exceed available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if dp * tp > devices.size:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, "
                         f"have {devices.size}")
    return Mesh(devices[:dp * tp].reshape(dp, tp), axis_names=("dp", "tp"))


def pad_index_for_tp(didx: DeviceIndex, tp: int) -> DeviceIndex:
    """Pad the block planes so num_blocks % tp == 0.

    Padding rows are never gathered (positions are clamped to length-1
    before block lookup), so zero-fill is safe.
    """
    nb = didx.table.shape[0]
    pad = (-nb) % tp
    if pad == 0:
        return didx
    table = jnp.concatenate(
        [didx.table, jnp.zeros((pad, didx.table.shape[1]),
                               didx.table.dtype)], axis=0)
    return dataclasses.replace(didx, table=table)


def _index_specs() -> DeviceIndex:
    return DeviceIndex(table=P("tp", None), Carr=P(),
                       sa_samples=P(), length=P(), sa0=P(), tp_axis=None)


def _pad_batch(arrs, dp: int):
    """Pad batch dim to a multiple of dp; returns (padded..., valid_count)."""
    B = arrs[0].shape[0]
    pad = (-B) % dp
    if pad == 0:
        return arrs, B
    out = []
    for a in arrs:
        out.append(jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0))
    return tuple(out), B


@partial(jax.jit, static_argnames=("mesh", "params", "cfg"))
def sharded_inexact_search(mesh: Mesh, didx: DeviceIndex, rc, lengths,
                           D, D_seed, params: AlnParams, cfg: EngineConfig):
    """inexact_search over a (dp, tp) mesh; same outputs, batch-sharded.

    Lanes are padded to a dp multiple with zero-length reads (which finish
    immediately); callers slice outputs back to the true batch.  The node
    arena comes back sharded on its LANE axis (P(None, "dp", None)), so
    walk_paths works on it unchanged with global lane ids: a lane's frames
    live entirely on its own device, and frame ids are lane-local.
    """
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    didx = pad_index_for_tp(didx, tp)
    (rc, lengths, D, D_seed), B = _pad_batch((rc, lengths, D, D_seed), dp)

    def body(didx_l, rc_l, len_l, D_l, Ds_l):
        # tp == 1: the index is fully replicated per shard, rank queries
        # are local, and the Pallas backends (incl. the resident kernel)
        # are eligible — dp sharding needs zero cross-chip communication
        # during the search (inexact_match.c:92-168's embarrassing
        # parallelism, mapped to the mesh).  tp > 1 range-shards the index
        # and routes rank queries through psum, which only the XLA body
        # implements.
        didx_l = dataclasses.replace(didx_l,
                                     tp_axis="tp" if tp > 1 else None)
        out = inexact_search(didx_l, rc_l, len_l, D_l, Ds_l, params, cfg)
        out["iters"] = jnp.broadcast_to(out["iters"], rc_l.shape[:1])
        for k in ("dma_pop", "dma_fat", "dma_wr"):   # per-shard scalars
            out.pop(k, None)
        return out

    out_specs = dict(
        n_alns=P("dp"), o_L=P("dp", None), o_U=P("dp", None),
        o_score=P("dp", None), o_len=P("dp", None), o_node=P("dp", None),
        o_mm=P("dp", None), o_go=P("dp", None), o_ge=P("dp", None),
        o_snp=P("dp", None), o_plen=P("dp", None), overflow=P("dp"),
        iters=P("dp"), n_pushed=P("dp"), n_work=P("dp"), ovwhy=P("dp"),
        arena=P(None, "dp", None))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(_index_specs(), P("dp", None), P("dp"),
                             P("dp", None, None), P("dp", None, None)),
                   out_specs=out_specs)
    out = fn(didx, rc, lengths, D, D_seed)
    return {k: (v[:, :B] if k == "arena" else v[:B])
            for k, v in out.items()}


@partial(jax.jit, static_argnames=("mesh", "params", "K", "max_len"))
def sharded_calc_d_chunk(mesh: Mesh, didx: DeviceIndex, seq, lengths,
                         params: AlnParams, K: int, max_len=None):
    """The calc_d full+seed pass of one batch over a (dp, tp) mesh; exactly
    the math of pipeline._calc_d_chunk, reads sharded on dp and the index
    range-sharded on tp.  Returns (D, Ds, overflow)."""
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    didx = pad_index_for_tp(didx, tp)
    (seq, lengths), B = _pad_batch((seq, lengths), dp)
    seed_len = int(params.seed_length)

    def body(didx_l, seq_l, len_l):
        didx_l = dataclasses.replace(didx_l,
                                     tp_axis="tp" if tp > 1 else None)
        if params.is_multiref:
            D, dov1 = calc_d(didx_l, seq_l, len_l, K=K)
        else:
            D, dov1 = calc_d_1to1(didx_l, seq_l, len_l)
        use_seed = (len_l > seed_len) & (seed_len > 0)
        sl = jnp.where(use_seed, seed_len, 0).astype(jnp.int32)
        if params.is_multiref:
            Ds, dov2 = calc_d(didx_l, seq_l, sl, K=K,
                              max_len=max(seed_len, 1))
        else:
            Ds, dov2 = calc_d_1to1(didx_l, seq_l, sl,
                                   max_len=max(seed_len, 1))
        # reads not using a seed keep an all-zero D_seed (calloc semantics,
        # inexact_match.c:36,62-64)
        Ds = jnp.where(use_seed[:, None, None], Ds, 0)
        return D, Ds, dov1 | (dov2 & use_seed)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(_index_specs(), P("dp", None), P("dp")),
                   out_specs=(P("dp", None, None), P("dp", None, None),
                              P("dp")))
    D, Ds, dov = fn(didx, seq, lengths)
    return D[:B], Ds[:B], dov[:B]


@partial(jax.jit, static_argnames=("mesh", "params", "cfg", "d_cap"))
def sharded_align_step(mesh: Mesh, didx: DeviceIndex, seq, rc, lengths,
                       params: AlnParams, cfg: EngineConfig,
                       d_cap: int = 32):
    """The FULL device alignment step on a (dp, tp) mesh: D bounds, seed-D
    bounds, inexact search, and SA resolution of each read's first alignment
    — everything `bwbble align` runs per batch (align_reads_inexact,
    inexact_match.c:46-66), compiled as one program over the mesh.
    """
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    didx = pad_index_for_tp(didx, tp)
    (seq, rc, lengths), B = _pad_batch((seq, rc, lengths), dp)
    seed_len = int(params.seed_length)

    def body(didx_l, seq_l, rc_l, len_l):
        didx_l = dataclasses.replace(didx_l,
                                     tp_axis="tp" if tp > 1 else None)
        if params.is_multiref:
            D, dov1 = calc_d(didx_l, seq_l, len_l, K=d_cap)
        else:
            D, dov1 = calc_d_1to1(didx_l, seq_l, len_l)
        use_seed = (len_l > seed_len) & (seed_len > 0)
        sl = jnp.where(use_seed, seed_len, 0).astype(jnp.int32)
        if params.is_multiref:
            Ds, dov2 = calc_d(didx_l, seq_l, sl, K=d_cap,
                              max_len=max(seed_len, 1))
        else:
            Ds, dov2 = calc_d_1to1(didx_l, seq_l, sl,
                                   max_len=max(seed_len, 1))
        Ds = jnp.where(use_seed[:, None, None], Ds, 0)
        out = inexact_search(didx_l, rc_l, len_l, D, Ds, params, cfg)
        out["overflow"] = out["overflow"] | dov1 | (dov2 & use_seed)
        out["iters"] = jnp.broadcast_to(out["iters"], rc_l.shape[:1])
        for k in ("dma_pop", "dma_fat", "dma_wr"):   # per-shard scalars
            out.pop(k, None)
        # resolve ref_pos of the first (best) alignment per read
        rows = jnp.where(out["n_alns"] > 0, out["o_L"][:, 0], 0)
        out["ref_pos"] = jnp.where(out["n_alns"] > 0,
                                   sa_resolve(didx_l, rows), -1)
        return out

    fn = shard_map(body, mesh=mesh,
                   in_specs=(_index_specs(), P("dp", None), P("dp", None),
                             P("dp")),
                   out_specs=P("dp"))
    out = fn(didx, seq, rc, lengths)
    return {k: v[:B] for k, v in out.items()}
