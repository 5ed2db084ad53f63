"""Fused masked nearest-neighbour search as a Pallas TPU kernel.

The jnp matcher (asdslam_tpu/ops/match.py) materializes the full [N, M]
squared-L2 distance matrix in HBM and then runs several elementwise/reduction
passes over it (window mask add, argmin, masked second-best min).  For the
reference workload (N = M = 2000, D = 128) that is ~16 MB of HBM traffic per
pass — the matcher is bandwidth-bound, not MXU-bound.

This kernel fuses the whole search: each (row-tile, col-tile) grid step
computes its distance tile on the MXU directly in VMEM, applies the window /
validity / scale-level gates, and folds the tile into a running
(best, second, argmin) triple that lives in the revisited output block.  The
[N, M] matrix never exists; HBM traffic is just the descriptors plus O(N)
outputs.

Replaces the hot part of ORBmatcher's candidate search loops
(src/vslam/src/ORBmatcher.cc: SearchByProjection / SearchForInitialization /
SearchByBoW all reduce to best+second-best masked descriptor distance with
DescriptorDistance); the ratio test, duplicate resolution and rotation
histogram stay outside on [N]-sized vectors (asdslam_tpu/ops/match.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30  # masked distance (avoid inf: inf-arithmetic NaNs inside the kernel)

TILE_N = 256
TILE_M = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a_ref, bt_ref, ainfo_ref, binfo_ref, best_ref, sec_ref, idx_ref,
            *, dmin: float, dmax: float, tile_m: int):
    j = pl.program_id(1)
    a = a_ref[:]   # (TN, D) bf16
    bt = bt_ref[:]  # (D, TM) bf16 — pre-transposed so the MXU sees a plain
    # (1, 0) contraction (Mosaic rejects bf16 dots contracting dim 1 of both)
    # precision must be DEFAULT explicitly: the package sets
    # jax_default_matmul_precision=highest for f32 geometry, and Mosaic
    # rejects (and the MXU cannot natively run) fp32-precision bf16 dots
    ab = jax.lax.dot_general(
        a, bt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    ai = ainfo_ref[:]  # (TN, 8) f32 rows: [|a|^2, x, y, rad^2, valid, level, -, -]
    bi = binfo_ref[:]  # (8, TM) f32 cols: [|b|^2, x, y, valid, level, -, -, -]

    dist = ai[:, 0:1] + bi[0:1, :] - 2.0 * ab
    dx = ai[:, 1:2] - bi[1:2, :]
    dy = ai[:, 2:3] - bi[2:3, :]
    ok = (dx * dx + dy * dy) <= ai[:, 3:4]
    ok &= (ai[:, 4:5] > 0.0) & (bi[3:4, :] > 0.0)
    ld = bi[4:5, :] - ai[:, 5:6]
    ok &= (ld >= dmin) & (ld <= dmax)
    dist = jnp.where(ok, jnp.maximum(dist, 0.0), BIG)

    tb = jnp.min(dist, axis=1, keepdims=True)        # (TN, 1)
    targ = jnp.argmin(dist, axis=1)                  # (TN,)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    ts = jnp.min(jnp.where(cols == targ[:, None], BIG, dist),
                 axis=1, keepdims=True)              # (TN, 1)
    tidx = (targ[:, None] + j * tile_m).astype(jnp.int32)

    @pl.when(j == 0)
    def _():
        best_ref[:] = tb
        sec_ref[:] = ts
        idx_ref[:] = tidx

    @pl.when(j > 0)
    def _():
        b0 = best_ref[:]
        s0 = sec_ref[:]
        i0 = idx_ref[:]
        # exact running top-2 merge; strict < keeps the first-occurrence
        # argmin semantics of jnp.argmin on ties
        best_ref[:] = jnp.minimum(b0, tb)
        sec_ref[:] = jnp.minimum(jnp.maximum(b0, tb), jnp.minimum(s0, ts))
        idx_ref[:] = jnp.where(tb < b0, tidx, i0)


def masked_nn(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    uv_a: jnp.ndarray | None = None,
    uv_b: jnp.ndarray | None = None,
    rad2: jnp.ndarray | float | None = None,
    levels_a: jnp.ndarray | None = None,
    levels_b: jnp.ndarray | None = None,
    level_window: tuple[float, float] = (-1e9, 1e9),
    interpret: bool = False,
):
    """Fused masked NN search.

    Returns (idx [N] int32, best [N] f32, second [N] f32); masked rows have
    best == second == BIG.  rad2 is the per-row (or scalar) SQUARED window
    radius; None disables the window gate.  level_window bounds
    levels_b[j] - levels_a[i] inclusive (static floats).
    """
    n, d = desc_a.shape
    m = desc_b.shape[0]
    tn = min(TILE_N, _round_up(n, 8))
    tm = min(TILE_M, _round_up(m, 128))
    np_, mp_ = _round_up(n, tn), _round_up(m, tm)

    def pad_rows(x, rows, fill=0.0):
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    a16 = pad_rows(desc_a.astype(jnp.bfloat16), np_)
    b16t = pad_rows(desc_b.astype(jnp.bfloat16), mp_).T  # (D, Mp)

    a2 = jnp.sum(desc_a * desc_a, axis=1)
    b2 = jnp.sum(desc_b * desc_b, axis=1)
    za = jnp.zeros((n,), jnp.float32)
    zb = jnp.zeros((m,), jnp.float32)
    ua = za if uv_a is None else uv_a[:, 0]
    va_y = za if uv_a is None else uv_a[:, 1]
    ub = zb if uv_b is None else uv_b[:, 0]
    vb_y = zb if uv_b is None else uv_b[:, 1]
    if rad2 is None:
        r2 = jnp.full((n,), BIG, jnp.float32)
    else:
        r2 = jnp.broadcast_to(jnp.asarray(rad2, jnp.float32), (n,))
    la = za if levels_a is None else levels_a.astype(jnp.float32)
    lb = zb if levels_b is None else levels_b.astype(jnp.float32)

    ainfo = jnp.stack(
        [a2, ua, va_y, r2, valid_a.astype(jnp.float32), la, za, za], axis=1)
    ainfo = pad_rows(ainfo, np_)
    binfo = jnp.stack(
        [b2, ub, vb_y, valid_b.astype(jnp.float32), lb, zb, zb, zb], axis=0)
    binfo = jnp.pad(binfo, ((0, 0), (0, mp_ - m)))

    dmin, dmax = float(level_window[0]), float(level_window[1])
    grid = (np_ // tn, mp_ // tm)
    kernel = functools.partial(_kernel, dmin=dmin, dmax=dmax, tile_m=tm)
    out_shape = [
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        jax.ShapeDtypeStruct((np_, 1), jnp.int32),
    ]
    best, sec, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(a16, b16t, ainfo, binfo)
    return idx[:n, 0], best[:n, 0], sec[:n, 0]
