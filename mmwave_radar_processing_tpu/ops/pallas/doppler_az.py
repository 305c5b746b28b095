"""Fused Doppler-azimuth response kernel: angle DFT + |.| + masked range-mean.

The velocity pipeline needs, per frame, the four antenna-sub-array responses

``resp[s, v, a] = (1/sum w) * sum_w w[w] * | sum_r u[ch(s,r), w, v] * F[s,r,a] |``

(reference ``doppler_azimuth_resp.py:296-334``: zero-padded angle DFT of each
4-antenna sub-array, magnitude, then the altitude-window mean over range
rows).  In XLA this materializes the ``[set, W, vel, angle]`` complex spectrum
to HBM twice (dot output + magnitude-reduce input) — measured ~19 ms of a
35 ms batch-1024 dispatch on the chip.  The spectrum per frame is only
~600 KB: this kernel keeps it entirely in VMEM.

Key layout choices (see docs/design.md §8):

- The angle contraction is K=4 — hostile to the 128x128 MXU (>30x padding
  waste measured as ~11 ms/batch in a matmul formulation).  Instead the
  kernel computes the spectrum as 16 *rank-1 VPU accumulations*: for each
  (set, rx) pair, an ``[Av, 1] x [1, W*nv]`` broadcast multiply-add.  At
  ~9 M VPU ops/frame this is compute-cheap and touches HBM only for the
  ``[12, W*nv]`` chirp spectrum in and the ``[4, Av, nv]`` responses out.
- Channels ride the *sublane* axis (12 -> 16) and the flattened
  ``(range_row, vel)`` index rides lanes, so per-channel rows slice without
  relayout; the response accumulates angle-major ``[Av, nv]`` and is
  transposed to the pipeline's ``[nv, Av]`` outside the kernel (tiny).
- The range-window weights are traced per frame; they enter through SMEM and
  scale each ``mag[:, w*nv:(w+1)*nv]`` slab on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_re_ref, u_im_ref, wgt_ref, fct_ref, fst_ref, out_ref, *,
            set_idx, n_sets, n_rx, win_rows, nv):
    for s in range(n_sets):
        sp_re = None
        sp_im = None
        for r in range(n_rx):
            ch = int(set_idx[s][r])
            ur = u_re_ref[ch, :][None, :]  # [1, M]
            ui = u_im_ref[ch, :][None, :]
            fc = fct_ref[:, n_rx * s + r][:, None]  # [Av, 1]
            fs = fst_ref[:, n_rx * s + r][:, None]
            t_re = fc * ur + fs * ui
            t_im = fc * ui - fs * ur
            sp_re = t_re if sp_re is None else sp_re + t_re
            sp_im = t_im if sp_im is None else sp_im + t_im
        mag = jnp.sqrt(sp_re * sp_re + sp_im * sp_im)  # [Av, M]
        acc = wgt_ref[0, 0] * mag[:, 0:nv]
        for w in range(1, win_rows):
            acc = acc + wgt_ref[0, w] * mag[:, w * nv:(w + 1) * nv]
        out_ref[s] = acc


def _kernel_batch(u_re_ref, u_im_ref, wgt_ref, fct_ref, fst_ref, out_ref, *,
                  set_idx, n_sets, n_rx, win_rows, nv, frames):
    for f in range(frames):
        for s in range(n_sets):
            sp_re = None
            sp_im = None
            for r in range(n_rx):
                ch = int(set_idx[s][r])
                ur = u_re_ref[f, ch, :][None, :]  # [1, M]
                ui = u_im_ref[f, ch, :][None, :]
                fc = fct_ref[:, n_rx * s + r][:, None]  # [Av, 1]
                fs = fst_ref[:, n_rx * s + r][:, None]
                t_re = fc * ur + fs * ui
                t_im = fc * ui - fs * ur
                sp_re = t_re if sp_re is None else sp_re + t_re
                sp_im = t_im if sp_im is None else sp_im + t_im
            mag = jnp.sqrt(sp_re * sp_re + sp_im * sp_im)  # [Av, M]
            acc = wgt_ref[f, 0] * mag[:, 0:nv]
            for w in range(1, win_rows):
                acc = acc + wgt_ref[f, w] * mag[:, w * nv:(w + 1) * nv]
            out_ref[f, s] = acc


@partial(jax.jit, static_argnames=("set_idx", "nv", "interpret",
                                   "frames_per_block"))
def set_responses_pallas_batch(
    u_re: jax.Array,
    u_im: jax.Array,
    wgt: jax.Array,
    fct: jax.Array,
    fst: jax.Array,
    *,
    set_idx,
    nv: int,
    interpret: bool = False,
    frames_per_block: int = 8,
) -> jax.Array:
    """Batched :func:`set_responses_pallas`: several frames per grid step.

    One frame's chirp spectrum is only ~120 KB — a per-frame grid step is
    DMA-latency-bound, not bandwidth-bound.  Blocking ``frames_per_block``
    frames per step amortizes the per-step DMA/setup cost (measured on the
    velocity pipeline at batch 1024: the response stage dominates the
    12.8 ms front half; see BENCH_SELF.md round 3).

    Args:
        u_re, u_im: ``[B, n_channels, W*nv]`` chirp-DFT'd spectra.
        wgt: ``[B, W]`` per-frame range-window weights.
        fct, fst: as in :func:`set_responses_pallas` (shared constants).

    Returns:
        ``[B, n_sets, Av, nv]`` float32 responses.
    """
    n_sets, n_rx = len(set_idx), len(set_idx[0])
    b, n_ch, m = u_re.shape
    av = fct.shape[0]
    win_rows = m // nv
    f = frames_per_block
    while b % f:
        f //= 2
    f = max(1, f)
    kern = partial(_kernel_batch, set_idx=set_idx, n_sets=n_sets, n_rx=n_rx,
                   win_rows=win_rows, nv=nv, frames=f)
    return pl.pallas_call(
        kern,
        grid=(b // f,),
        out_shape=jax.ShapeDtypeStruct((b, n_sets, av, nv), jnp.float32),
        in_specs=[
            pl.BlockSpec((f, n_ch, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, n_ch, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, win_rows), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((av, n_sets * n_rx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((av, n_sets * n_rx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, n_sets, av, nv), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_re, u_im, wgt, fct, fst)


@partial(jax.jit, static_argnames=("set_idx", "nv", "interpret"))
def set_responses_pallas(
    u_re: jax.Array,
    u_im: jax.Array,
    wgt: jax.Array,
    fct: jax.Array,
    fst: jax.Array,
    *,
    set_idx,
    nv: int,
    interpret: bool = False,
) -> jax.Array:
    """All sub-array responses of one frame, spectrum never touching HBM.

    Args:
        u_re, u_im: ``[n_channels, W*nv]`` chirp-DFT'd range-window spectrum,
            flattened ``(range_row, vel)`` on the minor axis.
        wgt: ``[W]`` range-window weights (mask already divided by its sum —
            the kernel computes a weighted sum, not a mean).
        fct, fst: ``[Av, n_sets*n_rx]`` transposed angle DFT factors,
            column ``s*n_rx + r`` = sub-array ``s``'s antenna ``r``
            (cos / sin planes, ``M = C - jS`` convention of
            :func:`ops.mxu.dft_factors`).
        set_idx: static tuple-of-tuples: channel index per (set, rx).
        nv: velocity bins per range row (minor-axis stride).

    Returns:
        ``[n_sets, Av, nv]`` float32 responses (angle-major; transpose
        outside for the pipeline's ``[nv, Av]``).
    """
    n_sets, n_rx = len(set_idx), len(set_idx[0])
    n_ch, m = u_re.shape
    av = fct.shape[0]
    win_rows = m // nv
    kern = partial(_kernel, set_idx=set_idx, n_sets=n_sets, n_rx=n_rx,
                   win_rows=win_rows, nv=nv)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_sets, av, nv), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_re, u_im, wgt.reshape(1, -1), fct, fst)


def _kernel_batch_paired(u_re_ref, u_im_ref, wgt_ref, fct_ref, fst_ref,
                         out_ref, *, n_groups, n_rx, win_rows, nv2, frames):
    for f in range(frames):
        for g in range(n_groups):
            sp_re = None
            sp_im = None
            for r in range(n_rx):
                row = g * n_rx + r
                ur = u_re_ref[f, row, :][None, :]  # [1, W*nv2]
                ui = u_im_ref[f, row, :][None, :]
                fc = fct_ref[:, row][:, None]  # [Av, 1]
                fs = fst_ref[:, row][:, None]
                t_re = fc * ur + fs * ui
                t_im = fc * ui - fs * ur
                sp_re = t_re if sp_re is None else sp_re + t_re
                sp_im = t_im if sp_im is None else sp_im + t_im
            mag = jnp.sqrt(sp_re * sp_re + sp_im * sp_im)  # [Av, W*nv2]
            acc = wgt_ref[f, 0] * mag[:, 0:nv2]
            for w in range(1, win_rows):
                acc = acc + wgt_ref[f, w] * mag[:, w * nv2:(w + 1) * nv2]
            out_ref[f, g] = acc


@partial(jax.jit, static_argnames=("n_groups", "n_rx", "nv2", "interpret",
                                   "frames_per_block"))
def group_responses_pallas_batch(
    u_re: jax.Array,
    u_im: jax.Array,
    wgt: jax.Array,
    fct: jax.Array,
    fst: jax.Array,
    *,
    n_groups: int,
    n_rx: int,
    nv2: int,
    interpret: bool = False,
    frames_per_block: int = 8,
) -> jax.Array:
    """Paired-lane variant of :func:`set_responses_pallas_batch`.

    The four sub-arrays come in two groups sharing one factor matrix each
    (the two azimuth sets use identical angle factors, ditto elevation —
    ``parallel/velocity_pipeline.py:124-132``), so both sets of a group ride
    SIDE BY SIDE on the lane axis: input row ``g*n_rx + r`` carries, for
    each range row ``w``, the two sets' ``nv``-lane slabs back to back
    (``nv2 = 2*nv`` lanes per ``w``).  One rank-1 accumulation then feeds
    both sets at once — 8 instead of 16 VPU rank-1s per frame, 2 instead of
    4 magnitude passes, half the weighted-sum slices — with bit-identical
    arithmetic per element (same accumulation order; asserted in
    ``tests/test_ops.py``).

    Args:
        u_re, u_im: ``[B, n_groups*n_rx, W*nv2]`` paired chirp spectra.
        wgt: ``[B, W]``; fct, fst: ``[Av, n_groups*n_rx]`` (column
            ``g*n_rx + r`` = group ``g``'s antenna ``r``).

    Returns:
        ``[B, n_groups, Av, nv2]``: lanes ``[:nv]`` = the group's first set,
        ``[nv:]`` = its second.
    """
    b, n_rows, m = u_re.shape
    av = fct.shape[0]
    win_rows = m // nv2
    f = frames_per_block
    while b % f:
        f //= 2
    f = max(1, f)
    kern = partial(_kernel_batch_paired, n_groups=n_groups, n_rx=n_rx,
                   win_rows=win_rows, nv2=nv2, frames=f)
    return pl.pallas_call(
        kern,
        grid=(b // f,),
        out_shape=jax.ShapeDtypeStruct((b, n_groups, av, nv2), jnp.float32),
        in_specs=[
            pl.BlockSpec((f, n_rows, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, n_rows, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, win_rows), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((av, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((av, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, n_groups, av, nv2),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_re, u_im, wgt, fct, fst)
