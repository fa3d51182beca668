"""Lockstep exact backward search over a read batch.

Device equivalent of exact_match / exact_match_bounded (exact_match.c:58-222):
all reads advance one character per step with masked inactive lanes; interval
lists live in fixed [B, K] arrays (see engine.intervals).
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


@partial(jax.jit, static_argnames=("K",))
def exact_search(didx: DeviceIndex, seq: jax.Array, lengths: jax.Array,
                 K: int = 16):
    """Multi-genome exact search of full reads (exact_match.c:58-60).

    Args: seq int8/int32 [B, Lmax] nt4 codes (padded); lengths int32 [B].
    Returns (Ls, Us, cnt, overflow): interval lists per lane; overflow lanes
    must be recomputed on the host.
    """
    seq = seq.astype(jnp.int32)
    B, Lmax = seq.shape
    Ls0 = jnp.zeros((B, K), dtype=didx.idt)
    Us0 = jnp.full((B, K), -1, dtype=didx.idt)
    Us0 = Us0.at[:, 0].set(didx.length - 1)
    cnt0 = jnp.ones((B,), dtype=jnp.int32)
    over0 = jnp.zeros((B,), dtype=bool)

    def body(s, state):
        Ls, Us, cnt, over = state
        r = lengths - 1 - s
        active = (r >= 0) & (cnt > 0)
        c = jnp.where(active, jnp.take_along_axis(
            seq, jnp.maximum(r, 0)[:, None], axis=1)[:, 0], 4)
        nLs, nUs, ncnt, _w, ov = expand_step(didx, Ls, Us, cnt, c)
        keep = ~active
        Ls = jnp.where(keep[:, None], Ls, nLs)
        Us = jnp.where(keep[:, None], Us, nUs)
        cnt = jnp.where(keep, cnt, ncnt)
        over = over | (active & ov)
        return Ls, Us, cnt, over

    Ls, Us, cnt, over = jax.lax.fori_loop(0, Lmax, body,
                                          (Ls0, Us0, cnt0, over0))
    return Ls, Us, cnt, over


@partial(jax.jit, static_argnames=())
def exact_search_1to1(didx: DeviceIndex, seq: jax.Array, lengths: jax.Array):
    """Single-interval backward search on a 4-letter reference
    (exact_match_1to1_bounded, exact_match.c:196-222)."""
    seq = seq.astype(jnp.int32)
    B, Lmax = seq.shape
    gray = jnp.asarray(np.array(C.NT4_GRAY, dtype=np.int32))

    def body(s, state):
        L, U, alive = state
        r = lengths - 1 - s
        active = alive & (r >= 0)
        cr = jnp.take_along_axis(seq, jnp.maximum(r, 0)[:, None], axis=1)[:, 0]
        is_n = cr > 3
        c = gray[jnp.clip(cr, 0, 4)]
        occL, occU = rank1_pair(didx, c, L - 1, U)
        Cc = jnp.take(didx.Carr, c)
        nL = Cc + occL + 1
        nU = Cc + occU
        ok = active & ~is_n & (nL <= nU)
        dead = active & (is_n | (nL > nU))
        return (jnp.where(ok, nL, L), jnp.where(ok, nU, U), alive & ~dead)

    L0 = jnp.zeros((B,), dtype=didx.idt)
    U0 = jnp.full((B,), didx.length - 1, dtype=didx.idt)
    L, U, alive = jax.lax.fori_loop(
        0, Lmax, body, (L0, U0, jnp.ones((B,), dtype=bool)))
    return L, U, alive
