"""Replicate the search loop's gather->transpose->pallas chain in
isolation and time gather formulations.

The real loop's rank-row gather fusion runs at ~9 ns/row while isolated
gathers run at ~0.1 ns/row; the suspected difference is the layout the
Pallas consumer forces back through the transpose chain onto the gather
output (scattered 4-byte stores).  Variants:

  take    jnp.take [R,32] -> reshape/transpose -> [RQ*32, B] (the real code)
  gatherT lax.gather emitting [RQ, 32, B] directly -> reshape
  take8   jnp.take on a bitcast [N, 32] int32 table viewed as [N, 128] u8

Run: python benchmarks/gather_pallas_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 913_021
B = 1024
RQ = 6
R = RQ * B
W = 32


def _kernel(rows_ref, out_ref):
    # minimal consumer with the real kernel's input layout demands:
    # reduce the [RQ*W, B] rows to a [8, B] digest
    acc = jnp.zeros((8, B), jnp.int32)
    for q in range(RQ):
        acc = acc + rows_ref[q * W:q * W + 8, :]
    out_ref[:] = acc


def consume(rows_T):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        in_specs=[pl.BlockSpec((RQ * W, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
    )(rows_T)


def v_take(table, kAll):
    rows = jnp.take(table, kAll.reshape(-1), axis=0)
    return rows.reshape(RQ, B, W).transpose(0, 2, 1).reshape(RQ * W, B)


def v_gatherT(table, kAll):
    dn = lax.GatherDimensionNumbers(offset_dims=(1,),
                                    collapsed_slice_dims=(0,),
                                    start_index_map=(0,))
    g = lax.gather(table, kAll.reshape(RQ, B, 1), dn, slice_sizes=(1, W))
    return g.reshape(RQ * W, B)


def run(name, variant):
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, W), np.int32))
    k0 = jnp.asarray(np.random.randint(0, N, (RQ, B), np.int32))

    def body(i, k):
        rows_T = variant(table, k)
        d = consume(rows_T)                      # [8, B]
        return (k + d[:6, :]) % N                # next indices depend on rows

    @jax.jit
    def loop(k):
        return lax.fori_loop(0, 200, body, k)

    loop(k0).block_until_ready()
    t0 = time.time()
    loop(k0).block_until_ready()
    dt = (time.time() - t0) / 200
    print(f"{name:8}: {dt*1e6:7.1f} us/iter ({dt/R*1e9:5.2f} ns/row)")


def _kernel_rowmajor(rows_ref, out_ref):
    # rows_ref: [RQ*B, W] stream-major rows; per-stream 2D transposes to
    # the kernel's lane-major [W, B] slabs IN VMEM
    acc = jnp.zeros((8, B), jnp.int32)
    for q in range(RQ):
        xt = rows_ref[q * B:(q + 1) * B, :].T         # [W, B]
        acc = acc + xt[:8, :]
    out_ref[:] = acc


def consume_rowmajor(rows):
    return pl.pallas_call(
        _kernel_rowmajor,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        in_specs=[pl.BlockSpec((RQ * B, W), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
    )(rows)


def v_take_rowmajor(table, kAll):
    # stream-major flatten, natural [R, W] row-major gather output
    return jnp.take(table, kAll.reshape(-1), axis=0)


def run_rowmajor():
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, W), np.int32))
    k0 = jnp.asarray(np.random.randint(0, N, (RQ, B), np.int32))

    def body(i, k):
        d = consume_rowmajor(v_take_rowmajor(table, k))
        return (k + d[:6, :]) % N

    @jax.jit
    def loop(k):
        return lax.fori_loop(0, 200, body, k)

    loop(k0).block_until_ready()
    t0 = time.time()
    loop(k0).block_until_ready()
    dt = (time.time() - t0) / 200
    print(f"rowmajor: {dt*1e6:7.1f} us/iter ({dt/R*1e9:5.2f} ns/row)")


def _kernel_pad128(rows_ref, out_ref):
    # rows_ref: [RQ*B, 128] stream-major rows gathered from a table whose
    # minor dim is EXACTLY the 128-lane tile (no padded-minor relayout on
    # the gather output); transpose each stream's [B, 128] slab to
    # lane-major IN the kernel
    acc = jnp.zeros((8, B), jnp.int32)
    for q in range(RQ):
        xt = rows_ref[q * B:(q + 1) * B, :].T         # [128, B]
        acc = acc + xt[:8, :]
    out_ref[:] = acc


def run_pad128():
    """Table padded 32 -> 128 words so the gather output's minor dim is a
    full lane tile: XLA keeps the natural row-major layout (bulk 512-B row
    copies) and the transpose moves inside the kernel."""
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, 128), np.int32))
    k0 = jnp.asarray(np.random.randint(0, N, (RQ, B), np.int32))

    def consume(rows):
        return pl.pallas_call(
            _kernel_pad128,
            out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
            in_specs=[pl.BlockSpec((RQ * B, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, B), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(rows)

    @jax.jit
    def loop(k, tbl):
        def body(i, k):
            rows = jnp.take(tbl, k.reshape(-1), axis=0)    # [R, 128]
            d = consume(rows)
            return (k + d[:6, :]) % N
        return lax.fori_loop(0, 200, body, k)

    loop(k0, table).block_until_ready()
    t0 = time.time()
    loop(k0, table).block_until_ready()
    dt = (time.time() - t0) / 200
    print(f"pad128  : {dt*1e6:7.1f} us/iter ({dt/R*1e9:5.2f} ns/row)")


def run_pad128_grid(B0=256):
    """pad128 with the real kernel's grid blocking over lanes."""
    table = jnp.asarray(np.random.randint(0, 1 << 30, (N, 128), np.int32))
    k0 = jnp.asarray(np.random.randint(0, N, (RQ, B), np.int32))
    grid = (B // B0,)

    def kern3(rows_ref, out_ref):
        acc = jnp.zeros((8, B0), jnp.int32)
        for q in range(RQ):
            xt = rows_ref[q, :, :].T                    # [128, B0]
            acc = acc + xt[:8, :]
        out_ref[:] = acc

    def consume3(rows):
        return pl.pallas_call(
            kern3, grid=grid,
            out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
            in_specs=[pl.BlockSpec((RQ, B0, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, B0), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(rows.reshape(RQ, B, 128))

    @jax.jit
    def loop(k, tbl):
        def body(i, k):
            rows = jnp.take(tbl, k.reshape(-1), axis=0)
            d = consume3(rows)
            return (k + d[:6, :]) % N
        return lax.fori_loop(0, 200, body, k)

    try:
        loop(k0, table).block_until_ready()
        t0 = time.time()
        loop(k0, table).block_until_ready()
        dt = (time.time() - t0) / 200
        print(f"pad128g3: {dt*1e6:7.1f} us/iter ({dt/R*1e9:5.2f} ns/row)")
    except Exception as e:
        print(f"pad128g3: FAILED {type(e).__name__}: {e}")


def run_rq(rq):
    """The real-code take variant at a different stream count (the mode-
    overlay idea: DFS lanes use 2 streams, exact lanes 2*kx; overlaying
    them cuts RQ from 2+2*kx to max(2, 2*kx))."""
    global RQ, R
    oRQ, oR = RQ, R
    RQ, R = rq, rq * B
    try:
        run(f"take_rq{rq}", v_take)
    finally:
        RQ, R = oRQ, oR


if __name__ == "__main__":
    run("take", v_take)
    run("gatherT", v_gatherT)
    run_rowmajor()
    run_pad128()
    run_pad128_grid()
    run_rq(4)
    run_rq(2)
