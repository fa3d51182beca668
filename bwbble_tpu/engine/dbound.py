"""Lockstep lower-bound (D) computation.

Device equivalent of calculate_d (inexact_match.c:171-254): a forward-
direction exact scan of the read that counts how many times the match set
empties (z) and the surviving SA width per position.  Multi-genome mode runs
over interval lists (engine.intervals); single-genome mode is a one-interval
walk.  Output D[b, t] = (num_diff, sa_intv_width) for t in [0, read_len],
indexed from the read's end like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bwbble_tpu import constants as C
from bwbble_tpu.engine.device_index import DeviceIndex
from bwbble_tpu.engine.intervals import expand_step
from bwbble_tpu.engine.rank import rank1_pair


@partial(jax.jit, static_argnames=("K", "max_len"))
def calc_d(didx: DeviceIndex, seq: jax.Array, lengths: jax.Array,
           K: int = 32, max_len: int | None = None):
    """Multi-genome D bounds.  Returns (D [B, max_len+1, 2] in the index
    dtype, overflow); D[b, t] = (num_diff, sa_intv_width)."""
    seq = seq.astype(jnp.int32)
    B, Lmax = seq.shape
    max_len = Lmax if max_len is None else max_len
    full_w = didx.length  # (length-1) - 0 + 1

    D0 = jnp.zeros((B, max_len + 1, 2), dtype=didx.idt)
    Ls0 = jnp.zeros((B, K), dtype=didx.idt)
    Us0 = jnp.full((B, K), -1, dtype=didx.idt).at[:, 0].set(didx.length - 1)
    cnt0 = jnp.ones((B,), dtype=jnp.int32)
    z0 = jnp.zeros((B,), dtype=didx.idt)
    over0 = jnp.zeros((B,), dtype=bool)

    def body(s, state):
        D, Ls, Us, cnt, z, over = state
        r = lengths - 1 - s
        active = r >= 0
        c = jnp.where(active, jnp.take_along_axis(
            seq, jnp.maximum(r, 0)[:, None], axis=1)[:, 0], 4)
        nLs, nUs, ncnt, w, ov = expand_step(didx, Ls, Us, cnt, c)
        empty = ncnt == 0
        # on empty: reset to the full range, count a difference, and report
        # the full width (inexact_match.c:239-244)
        nz = z + jnp.where(empty, 1, 0)
        nLs = jnp.where(empty[:, None], Ls0, nLs)
        nUs = jnp.where(empty[:, None], Us0, nUs)
        ncnt = jnp.where(empty, 1, ncnt)
        w = jnp.where(empty, full_w, w)
        old = jax.lax.dynamic_slice_in_dim(D, s, 1, axis=1)[:, 0, :]
        row = jnp.where(active[:, None],
                        jnp.stack([nz, w.astype(nz.dtype)], axis=1), old)
        D = jax.lax.dynamic_update_slice_in_dim(D, row[:, None, :], s, axis=1)
        keep = ~active
        Ls = jnp.where(keep[:, None], Ls, nLs)
        Us = jnp.where(keep[:, None], Us, nUs)
        cnt = jnp.where(keep, cnt, ncnt)
        z = jnp.where(keep, z, nz)
        over = over | (active & ov)
        return D, Ls, Us, cnt, z, over

    D, Ls, Us, cnt, z, over = jax.lax.fori_loop(
        0, min(Lmax, max_len), body, (D0, Ls0, Us0, cnt0, z0, over0))
    # D[read_len] = (z+1, 0)  (inexact_match.c:249-250)
    tail = jnp.stack([z + 1, jnp.zeros_like(z)], axis=1)
    D = D.at[jnp.arange(B), jnp.clip(lengths, 0, max_len)].set(tail)
    return D, over


@partial(jax.jit, static_argnames=("max_len",))
def calc_d_1to1(didx: DeviceIndex, seq: jax.Array, lengths: jax.Array,
                max_len: int | None = None):
    """Single-genome D bounds (inexact_match.c:176-205)."""
    seq = seq.astype(jnp.int32)
    B, Lmax = seq.shape
    max_len = Lmax if max_len is None else max_len
    gray = jnp.asarray(np.array(C.NT4_GRAY, dtype=np.int32))

    D0 = jnp.zeros((B, max_len + 1, 2), dtype=didx.idt)

    def body(s, state):
        D, L, U, z = state
        r = lengths - 1 - s
        active = r >= 0
        cr = jnp.take_along_axis(seq, jnp.maximum(r, 0)[:, None], axis=1)[:, 0]
        c = gray[jnp.clip(cr, 0, 4)]
        is_n = c == C.ORDER_N
        occL, occU = rank1_pair(didx, c, L - 1, U)
        Cc = jnp.take(didx.Carr, c)
        nL = jnp.where(is_n, 0, Cc + occL + 1)
        nU = jnp.where(is_n, didx.length - 1, Cc + occU)
        miss = is_n | (nL > nU)
        nz = z + jnp.where(miss, 1, 0)
        nL = jnp.where(miss, 0, nL)
        nU = jnp.where(miss, didx.length - 1, nU)
        old = jax.lax.dynamic_slice_in_dim(D, s, 1, axis=1)[:, 0, :]
        row = jnp.where(active[:, None],
                        jnp.stack([nz, nU - nL + 1], axis=1), old)
        D = jax.lax.dynamic_update_slice_in_dim(D, row[:, None, :], s, axis=1)
        L = jnp.where(active, nL, L)
        U = jnp.where(active, nU, U)
        z = jnp.where(active, nz, z)
        return D, L, U, z

    L0 = jnp.zeros((B,), dtype=didx.idt)
    U0 = jnp.full((B,), didx.length - 1, dtype=didx.idt)
    D, L, U, z = jax.lax.fori_loop(0, min(Lmax, max_len), body,
                                   (D0, L0, U0, jnp.zeros((B,), didx.idt)))
    tail = jnp.stack([z + 1, jnp.zeros_like(z)], axis=1)
    D = D.at[jnp.arange(B), jnp.clip(lengths, 0, max_len)].set(tail)
    return D, jnp.zeros((B,), dtype=bool)
