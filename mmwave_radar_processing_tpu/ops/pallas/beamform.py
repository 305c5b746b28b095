"""Fused Bartlett beamforming power as one Pallas kernel.

The XLA formulation of ``P = mean_k |A^H x_k|^2`` materializes the steered
snapshot tensor ``S`` of shape ``[batch*range, angles, chirps]`` in HBM
between the batched matmul and the reduction — for a 1024-frame batch of the
flagship cube that is ``1024*63*64*70`` floats per plane (~2.3 GB round trip),
dwarfing the useful output (``[batch*range, angles]`` ~16 MB).

This kernel keeps ``S`` in VMEM: per grid step it loads a tile of range-bin
snapshot blocks ``[TILE, A, K]``, runs the four steering matmuls on the MXU,
squares and reduces over chirps in registers, and writes back only the
``[TILE, angles]`` power tile.  HBM traffic is one snapshot read + one power
write — the beamforming path named in the build target ("covariance /
steering-matrix beamforming paths" in Pallas).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmwave_radar_processing_tpu.ops.mxu import C2

_TILE = 8


def _bartlett_kernel(xr_ref, xi_ref, art_ref, ait_ref, out_ref, *, tile, inv_k):
    art = art_ref[:]  # (M, A) steering, conjugate-transposed layout
    ait = ait_ref[:]
    for t in range(tile):
        xr = xr_ref[t]  # (A, K)
        xi = xi_ref[t]
        # s = a^H x : sr = Ar^T xr + Ai^T xi ; si = Ar^T xi - Ai^T xr
        sr = (
            jnp.dot(art, xr, preferred_element_type=jnp.float32)
            + jnp.dot(ait, xi, preferred_element_type=jnp.float32)
        )
        si = (
            jnp.dot(art, xi, preferred_element_type=jnp.float32)
            - jnp.dot(ait, xr, preferred_element_type=jnp.float32)
        )
        out_ref[t, :] = jnp.sum(sr * sr + si * si, axis=1) * inv_k


@partial(jax.jit, static_argnames=("interpret",))
def bartlett_power(x: C2, steering: C2, *, interpret: bool = False) -> jax.Array:
    """Fused Bartlett spectrum ``mean_k |a^H x_k|^2``.

    Args:
        x: ``[..., A, K]`` split-complex snapshots (leading dims = batch).
        steering: ``(A, M)`` split-complex steering matrix.

    Returns:
        ``[..., M]`` float32 power, bit-compatible with
        :func:`ops.beamform.bartlett_from_snapshots` within matmul
        reassociation tolerance.
    """
    lead = x.re.shape[:-2]
    a, k = x.re.shape[-2:]
    m = steering.re.shape[-1]
    xr = x.re.reshape(-1, a, k).astype(jnp.float32)
    xi = x.im.reshape(-1, a, k).astype(jnp.float32)
    n = xr.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)

    art = steering.re.T.astype(jnp.float32)  # (M, A)
    ait = steering.im.T.astype(jnp.float32)

    out = pl.pallas_call(
        partial(_bartlett_kernel, tile=_TILE, inv_k=1.0 / float(k)),
        out_shape=jax.ShapeDtypeStruct((n_pad, m), jnp.float32),
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, a, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, a, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xi, art, ait)
    return out[:n].reshape(lead + (m,))
