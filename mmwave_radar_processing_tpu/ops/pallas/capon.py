"""Fused Capon/MVDR kernel: covariance + Cholesky + spectrum in VMEM.

Round-4 stage bisection of the XLA Capon pipeline (batch 1024, A=4, 63
range bins, 70 chirps, 64 angles; /tmp-protocol in BENCH_SELF.md):

- windowed range DFT: 1.58 ms
- + snapshot covariance: 4.70 ms  (tiny ``[4,70]x[70,4]`` batched matmuls —
  MXU at <1% utilization)
- + real-embedded unrolled Cholesky inverse: 11.30 ms  (~255 dependent
  elementwise ops, each a separate ~26 us XLA kernel on this runtime)
- + angle matmul + reciprocal: 11.55 ms

i.e. ~85% of the pipeline is launch/layout overhead around trivial
arithmetic (~0.5 M VPU element-ops per frame).  This kernel performs the
whole per-frame chain — covariance accumulation, *complex* n=4 Cholesky,
triangular inverse, steering application and power — inside one Pallas
program, so the recurrences are register/VMEM traffic instead of 255 kernel
launches.

Layout (per grid step = one frame block):

- input range-DFT'd snapshots ``[A, W, K]`` ride VMEM tiles with range bins
  ``W`` on sublanes and chirps ``K`` on lanes, so each covariance entry is
  an elementwise multiply + LANE reduction -> a ``[W, 1]`` column;
- the Cholesky/inverse recurrences operate on those ``[W, 1]`` columns (all
  range bins in parallel, matrix entries unrolled in Python — n=4 complex,
  ~125 vector ops);
- the spectrum applies ``P = 1 / sum_i |sum_j Linv[i][j] a[j]|^2`` as
  ``[W, 1] x [1, M]`` broadcast products straight into the ``[W, M]``
  output tile.

The complex n=4 factorization replaces the real 2A=8 embedding (the
embedded SPD form is mathematically identical; ``a^H R^-1 a = ||L^-1 a||^2``
holds in both fields) — half the recurrence count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, xi_ref, ar_ref, ai_ref, out_ref, *, n_ant, frames,
            loading, inv_k):
    tiny = jnp.finfo(jnp.float32).tiny
    for f in range(frames):
        # covariance entries r[i][j] (i >= j), complex, [W, 1] columns:
        # R = X X^H / K  with X = [A, W, K] -> r_ij = sum_k x_i conj(x_j) / K
        rr = [[None] * n_ant for _ in range(n_ant)]
        ri = [[None] * n_ant for _ in range(n_ant)]
        x_r = [xr_ref[f, a] for a in range(n_ant)]  # [W, K] tiles
        x_i = [xi_ref[f, a] for a in range(n_ant)]
        for i in range(n_ant):
            for j in range(i + 1):
                rr[i][j] = jnp.sum(
                    x_r[i] * x_r[j] + x_i[i] * x_i[j], axis=-1,
                    keepdims=True) * inv_k
                ri[i][j] = jnp.sum(
                    x_i[i] * x_r[j] - x_r[i] * x_i[j], axis=-1,
                    keepdims=True) * inv_k
        # relative diagonal loading (ops/beamform.diagonal_load)
        tr = rr[0][0]
        for i in range(1, n_ant):
            tr = tr + rr[i][i]
        load = loading * tr * (1.0 / n_ant) + 1e-12
        for i in range(n_ant):
            rr[i][i] = rr[i][i] + load

        # complex Cholesky, n = n_ant, diag real: L[j][j] = d_j
        lr = [[None] * n_ant for _ in range(n_ant)]
        li = [[None] * n_ant for _ in range(n_ant)]
        for j in range(n_ant):
            s = rr[j][j]
            for k in range(j):
                s = s - (lr[j][k] * lr[j][k] + li[j][k] * li[j][k])
            d = jnp.sqrt(jnp.maximum(s, tiny))
            lr[j][j] = d
            li[j][j] = None  # real diagonal
            for i in range(j + 1, n_ant):
                sr, si = rr[i][j], ri[i][j]
                for k in range(j):
                    # L[i][k] * conj(L[j][k])
                    sr = sr - (lr[i][k] * lr[j][k] + li[i][k] * li[j][k])
                    si = si - (li[i][k] * lr[j][k] - lr[i][k] * li[j][k])
                inv_d = 1.0 / d
                lr[i][j] = sr * inv_d
                li[i][j] = si * inv_d

        # triangular inverse (forward substitution on the identity)
        vr = [[None] * n_ant for _ in range(n_ant)]
        vi = [[None] * n_ant for _ in range(n_ant)]
        for j in range(n_ant):
            vr[j][j] = 1.0 / lr[j][j]
            for i in range(j + 1, n_ant):
                sr = lr[i][j] * vr[j][j]
                si = li[i][j] * vr[j][j]
                for k in range(j + 1, i):
                    sr = sr + (lr[i][k] * vr[k][j] - li[i][k] * vi[k][j])
                    si = si + (lr[i][k] * vi[k][j] + li[i][k] * vr[k][j])
                inv_d = -1.0 / lr[i][i]
                vr[i][j] = sr * inv_d
                vi[i][j] = si * inv_d

        # P = 1 / sum_i |g_i|^2,  g_i[m] = sum_{j<=i} Linv[i][j] * a[j][m]
        denom = None
        for i in range(n_ant):
            gr = gi = None
            for j in range(i + 1):
                a_r = ar_ref[j, :][None, :]  # [1, M]
                a_i = ai_ref[j, :][None, :]
                tr_ = vr[i][j] * a_r
                ti_ = vr[i][j] * a_i
                if vi[i][j] is not None:
                    tr_ = tr_ - vi[i][j] * a_i
                    ti_ = ti_ + vi[i][j] * a_r
                gr = tr_ if gr is None else gr + tr_
                gi = ti_ if gi is None else gi + ti_
            term = gr * gr + gi * gi
            denom = term if denom is None else denom + term
        out_ref[f] = 1.0 / jnp.maximum(denom, tiny)


@partial(jax.jit, static_argnames=("loading", "interpret", "frames_per_block"))
def capon_power_pallas(
    xr: jax.Array,
    xi: jax.Array,
    ar: jax.Array,
    ai: jax.Array,
    *,
    loading: float = 1e-2,
    interpret: bool = False,
    frames_per_block: int = 8,
) -> jax.Array:
    """Fused Capon range-azimuth power maps.

    Args:
        xr, xi: ``[B, A, W, K]`` split-complex range-DFT'd snapshots (range
            bins ``W`` on the sublane axis, chirps ``K`` on lanes — the
            natural ``range_dft_channels`` output layout).
        ar, ai: ``(A, M)`` split-complex steering matrix.
        loading: relative diagonal loading (matches
            :func:`ops.beamform.diagonal_load`).

    Returns:
        ``[B, W, M]`` float32 Capon power, equal to
        :func:`ops.beamform.capon_from_covariance` of the sample covariance
        to float32 rounding (asserted in ``tests/test_beamform.py``).
    """
    b, n_ant, w, k = xr.shape
    m = ar.shape[1]
    f = frames_per_block
    while b % f:
        f //= 2
    f = max(1, f)
    kern = partial(_kernel, n_ant=n_ant, frames=f, loading=float(loading),
                   inv_k=1.0 / float(k))
    return pl.pallas_call(
        kern,
        grid=(b // f,),
        out_shape=jax.ShapeDtypeStruct((b, w, m), jnp.float32),
        in_specs=[
            pl.BlockSpec((f, n_ant, w, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, n_ant, w, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ant, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ant, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, w, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xi, ar, ai)


def _bartlett_kernel(xr_ref, xi_ref, aa_ref, tr_ref, ti_ref, out_ref, *,
                     n_ant, frames, inv_k):
    for f in range(frames):
        x_r = [xr_ref[f, a] for a in range(n_ant)]  # [W, K] tiles
        x_i = [xi_ref[f, a] for a in range(n_ant)]
        acc = None
        pair = 0
        for i in range(n_ant):
            # diagonal: |a_i[m]|^2 * r_ii  (r_ii real)
            r_ii = jnp.sum(x_r[i] * x_r[i] + x_i[i] * x_i[i], axis=-1,
                           keepdims=True) * inv_k  # [W, 1]
            term = r_ii * aa_ref[i, :][None, :]  # [W, M]
            acc = term if acc is None else acc + term
            for j in range(i):
                # off-diagonal pair (i > j): 2 Re(r_ij * conj(a_i) a_j)
                rr = jnp.sum(x_r[i] * x_r[j] + x_i[i] * x_i[j], axis=-1,
                             keepdims=True) * inv_k
                ri = jnp.sum(x_i[i] * x_r[j] - x_r[i] * x_i[j], axis=-1,
                             keepdims=True) * inv_k
                acc = acc + (rr * tr_ref[pair, :][None, :]
                             - ri * ti_ref[pair, :][None, :])
                pair += 1
        out_ref[f] = acc


@partial(jax.jit, static_argnames=("interpret", "frames_per_block"))
def bartlett_power_pallas_cov(
    xr: jax.Array,
    xi: jax.Array,
    ar: jax.Array,
    ai: jax.Array,
    *,
    interpret: bool = False,
    frames_per_block: int = 8,
) -> jax.Array:
    """Fused Bartlett maps via covariance pairs — the capon kernel minus
    the solve.

    ``P_m = a_m^H R a_m = sum_i |a_im|^2 r_ii + 2 sum_{i>j} Re(r_ij
    conj(a_im) a_jm)``: each of the A + A(A-1)/2 unique covariance entries
    is one multiply + lane-reduction, then rank-1 broadcast products with
    the PRECOMPUTED angle-pair constants accumulate straight into the
    ``[W, M]`` output tile.  Strictly less work than
    :func:`capon_power_pallas` (no Cholesky), same layout; replaces both
    the snapshot-projection Pallas kernel (round 2) and the XLA einsum
    (measured round 4: 6.8 ms -> see BENCH_SELF).

    Args / returns: as :func:`capon_power_pallas` (minus ``loading``).
    """
    b, n_ant, w, k = xr.shape
    m = ar.shape[1]
    aa = ar * ar + ai * ai  # (A, M)
    trs, tis = [], []
    for i in range(n_ant):
        for j in range(i):
            trs.append(2.0 * (ar[i] * ar[j] + ai[i] * ai[j]))
            tis.append(2.0 * (ar[i] * ai[j] - ai[i] * ar[j]))
    tr = jnp.stack(trs) if trs else jnp.zeros((1, m), jnp.float32)
    ti = jnp.stack(tis) if tis else jnp.zeros((1, m), jnp.float32)
    n_pairs = tr.shape[0]

    f = frames_per_block
    while b % f:
        f //= 2
    f = max(1, f)
    kern = partial(_bartlett_kernel, n_ant=n_ant, frames=f,
                   inv_k=1.0 / float(k))
    return pl.pallas_call(
        kern,
        grid=(b // f,),
        out_shape=jax.ShapeDtypeStruct((b, w, m), jnp.float32),
        in_specs=[
            pl.BlockSpec((f, n_ant, w, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, n_ant, w, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ant, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pairs, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pairs, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, w, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xi, aa, tr, ti)
