"""Fully fused OS-CFAR 2D noise estimation as one Pallas kernel.

The naive formulation materializes every CUT's training window — a ~190x data
expansion of the range-Doppler map through HBM — before rank-selecting.  A
radar map is tiny (63x70 floats = 17.6 KB): the whole thing fits in VMEM with
room to spare, so this kernel

1. loads one frame's map into VMEM,
2. builds the ``[R', D', W]`` training tensor *in VMEM* from static shifted
   slices (no HBM expansion, no gather),
3. runs a fully unrolled bitonic sort along the (power-of-two padded) window
   axis in registers/VMEM,
4. writes back only the ``[R', D']`` rank-k noise map.

HBM traffic per frame: one map read + one core-noise write (~35 KB) instead
of hundreds of MB.  Batch frames map to the Pallas grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmwave_radar_processing_tpu.ops.pallas.rank_select import (
    _bitonic_sort_block,
    _bitonic_sort_block_axis0,
    _next_pow2,
)


def _fused_kernel(x_ref, out_ref, train_scratch, *, offsets, guard_box,
                  win_d, n_window, r_out, d_out, w_pad, k_idx,
                  unroll_build: bool):
    # 1+2: stack shifted slices of the VMEM-resident map.
    if unroll_build:
        for idx, (i, j) in enumerate(offsets):
            train_scratch[:, :, idx] = x_ref[0, i : i + r_out, j : j + d_out]
        if len(offsets) < w_pad:
            train_scratch[:, :, len(offsets):] = jnp.full(
                (r_out, d_out, w_pad - len(offsets)), jnp.inf, jnp.float32
            )
    else:
        # Loop-based build keeps the Mosaic program small: one fori_loop body
        # per static lane offset j (dynamic starts are only legal on non-lane
        # dims, so i is traced, j unrolled; the scratch keeps the window axis
        # *leading* to accept the dynamic slot writes).  Guard+CUT cells are
        # written as +inf, which cannot change the rank-k statistic for
        # k <= n_train since +inf sorts last.
        gr0, gr1, gd0, gd1 = guard_box
        win_r = n_window // win_d

        for j in range(win_d):
            def body(i, _, j=j):
                is_guard = (
                    (i >= gr0) & (i <= gr1)
                    & jnp.asarray((j >= gd0) and (j <= gd1))
                )
                slab = x_ref[0, pl.ds(i, r_out), j : j + d_out]
                slab = jnp.where(is_guard, jnp.inf, slab)
                train_scratch[pl.ds(i * win_d + j, 1), :, :] = slab[None]
                return 0

            jax.lax.fori_loop(0, win_r, body, 0)
        if n_window < w_pad:
            train_scratch[n_window:, :, :] = jnp.full(
                (w_pad - n_window, r_out, d_out), jnp.inf, jnp.float32
            )

        # 3: bitonic rank selection along the leading window axis
        sorted_w = _bitonic_sort_block_axis0(train_scratch[:], w_pad)
        out_ref[0] = sorted_w[k_idx]
        return

    # 3: bitonic rank selection along the window axis
    flat = train_scratch[:].reshape(r_out * d_out, w_pad)
    sorted_flat = _bitonic_sort_block(flat, w_pad)

    # 4: rank-k noise estimate
    out_ref[0] = sorted_flat[:, k_idx].reshape(r_out, d_out)


def _detect_kernel(x_ref, out_ref, *, guard_box, win_r, win_d, r_out, d_out,
                   edge_r, edge_d, k, alpha, rows, cols, nb):
    """Counting OS-CFAR detection, batched lane-major: block is ``(R, D, NB)``.

    ``x > alpha * rank_k(train)  <=>  #{t : alpha*t < x} >= k`` (see
    ``ops/cfar.py`` detection-only section) — so detection needs no rank
    selection at all: one compare+add per training offset.

    Layout is the whole trick.  A one-map-per-grid-step kernel serializes the
    batch and fills at most 70 of 128 VPU lanes with a 63x70 map (measured
    2.2x *slower* end-to-end than the XLA shifted-slice formulation despite
    ~190x less HBM traffic).  Putting the *batch* on the lane axis instead
    keeps all 128 lanes busy, and both window shifts land on the untiled row
    axis (``i``, dynamic ``pl.ds``) and the sublane column axis (``j``,
    static, unrolled) — no lane-crossing relayouts anywhere.
    """
    gr0, gr1, gd0, gd1 = guard_box
    center = x_ref[edge_r : edge_r + r_out, edge_d : edge_d + d_out, :]
    count = jnp.zeros((r_out, d_out, nb), jnp.float32)

    for j in range(win_d):
        def body(i, cnt, j=j):
            is_guard = (
                (i >= gr0) & (i <= gr1) & jnp.asarray((j >= gd0) and (j <= gd1))
            )
            slab = x_ref[pl.ds(i, r_out), j : j + d_out, :]
            hit = jnp.where(alpha * slab < center, 1.0, 0.0)
            return cnt + jnp.where(is_guard, 0.0, hit)

        count = jax.lax.fori_loop(0, win_r, body, count)

    det = jnp.where(count >= k, 1.0, 0.0)
    # edge convention: no detection within train+guard of the borders.
    # Pad via concatenation (a scatter/.at[].set does not lower on TPU).
    padded = jnp.concatenate([
        jnp.zeros((edge_r, d_out, nb), jnp.float32),
        det,
        jnp.zeros((rows - edge_r - r_out, d_out, nb), jnp.float32),
    ], axis=0)
    out_ref[...] = jnp.concatenate([
        jnp.zeros((rows, edge_d, nb), jnp.float32),
        padded,
        jnp.zeros((rows, cols - edge_d - d_out, nb), jnp.float32),
    ], axis=1)


@partial(jax.jit, static_argnames=("num_train", "num_guard", "rho", "alpha",
                                   "interpret"))
def os_cfar_2d_detect_fused(
    x: jax.Array,
    *,
    num_train,
    num_guard,
    rho: float,
    alpha: float,
    interpret: bool = False,
) -> jax.Array:
    """Fully fused counting OS-CFAR 2D detection mask (batched, lane-major).

    HBM traffic: one map read + one mask write per frame (~35 KB) — the XLA
    counting formulation (``ops/cfar.os_2d_detect``) reads a shifted copy of
    the map per training offset (~187x expansion, ~2.1 MB/frame on the
    flagship window), which made CFAR the dominant HBM consumer of the fused
    point-cloud pipeline (bandwidth-bound per ``bench.py`` roofline).  The
    batch is transposed to the 128-wide lane axis so every VPU lane carries a
    different frame; the two transposes cost two map-sized HBM round trips,
    still ~90x less traffic than the slice expansion.

    Args:
        x: ``[R, D]`` or ``[..., R, D]`` magnitude map(s).

    Returns:
        bool detection mask, same shape, bit-identical to
        ``ops/cfar.os_2d_detect`` (edges False).
    """
    from mmwave_radar_processing_tpu.ops.cfar import os_rank, _train_mask_2d

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    lead = x.shape[:-2]
    x = x.reshape((-1,) + x.shape[-2:])
    b, rows, cols = x.shape
    edge_r = num_train[0] + num_guard[0]
    edge_d = num_train[1] + num_guard[1]
    win_r, win_d = 2 * edge_r + 1, 2 * edge_d + 1
    r_out = rows - win_r + 1
    d_out = cols - win_d + 1
    k = os_rank(rho, int(_train_mask_2d(num_train, num_guard).sum()))
    guard_box = (num_train[0], num_train[0] + 2 * num_guard[0],
                 num_train[1], num_train[1] + 2 * num_guard[1])

    nb = 128  # lane-axis batch block
    b_pad = -(-b // nb) * nb
    xt = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))  # (R, D, B)
    if b_pad != b:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, b_pad - b)))

    out = pl.pallas_call(
        partial(
            _detect_kernel,
            guard_box=guard_box,
            win_r=win_r,
            win_d=win_d,
            r_out=r_out,
            d_out=d_out,
            edge_r=edge_r,
            edge_d=edge_d,
            k=float(k),
            alpha=float(alpha),
            rows=rows,
            cols=cols,
            nb=nb,
        ),
        out_shape=jax.ShapeDtypeStruct((rows, cols, b_pad), jnp.float32),
        grid=(b_pad // nb,),
        in_specs=[
            pl.BlockSpec((rows, cols, nb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rows, cols, nb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt)
    det = jnp.transpose(out[..., :b] > 0.5, (2, 0, 1))
    det = det.reshape(lead + (rows, cols))
    return det[0] if squeeze else det


@partial(jax.jit, static_argnames=("num_train", "num_guard", "k_rank",
                                   "interpret", "unroll_build"))
def os_cfar_2d_noise_fused(
    x: jax.Array,
    *,
    num_train,
    num_guard,
    k_rank: int,
    interpret: bool = False,
    unroll_build: bool = False,
) -> jax.Array:
    """Rank-``k_rank`` training-cell noise map for OS-CFAR 2D.

    Args:
        x: ``[R, D]`` or ``[B, R, D]`` magnitude map(s).

    Returns:
        ``[R', D']`` (or batched) noise estimates for the valid core,
        ``R' = R - 2*(train+guard)`` per axis; edge padding is the caller's
        concern (``ops.cfar.os_2d`` applies the +inf convention).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, rows, cols = x.shape
    win_r = 2 * (num_train[0] + num_guard[0]) + 1
    win_d = 2 * (num_train[1] + num_guard[1]) + 1
    r_out = rows - win_r + 1
    d_out = cols - win_d + 1

    mask = np.ones((win_r, win_d), dtype=bool)
    mask[
        num_train[0] : num_train[0] + 2 * num_guard[0] + 1,
        num_train[1] : num_train[1] + 2 * num_guard[1] + 1,
    ] = False
    offsets = tuple(map(tuple, np.argwhere(mask)))
    n_window = win_r * win_d
    width = len(offsets) if unroll_build else n_window
    w_pad = max(_next_pow2(width), 128)
    guard_box = (num_train[0], num_train[0] + 2 * num_guard[0],
                 num_train[1], num_train[1] + 2 * num_guard[1])

    out = pl.pallas_call(
        partial(
            _fused_kernel,
            offsets=offsets,
            guard_box=guard_box,
            win_d=win_d,
            n_window=n_window,
            r_out=r_out,
            d_out=d_out,
            w_pad=w_pad,
            k_idx=k_rank - 1,
            unroll_build=unroll_build,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_out, d_out), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, r_out, d_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (r_out, d_out, w_pad) if unroll_build else (w_pad, r_out, d_out),
                jnp.float32,
            )
        ],
        interpret=interpret,
    )(x.astype(jnp.float32))
    return out[0] if squeeze else out
