"""Bitonic k-th-smallest selection as a Pallas TPU kernel.

OS-CFAR needs the rank-``k`` training cell per CUT — for the flagship 2D
config that is the 106th smallest of 152 cells at every one of ~2.6k cells per
frame.  ``jnp.sort`` lowers to XLA's generic multi-pass sort, which round-trips
HBM every pass and dominates the fused pipeline's runtime.  This kernel keeps
each tile of windows resident in VMEM and runs the full bitonic network
(static, fully unrolled — ``log^2(W)`` compare-exchange steps of rolls +
selects on ``[TILE, W]`` blocks) before writing back one float per window.

The XOR-partner exchange of each bitonic step is two ``pltpu.roll``s plus a
static lane mask; ascending/descending block directions are trace-time
constants.  Windows are padded to a power of two with ``+inf`` so padding
never lands below rank ``k``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _bitonic_sort_block(x: jax.Array, w: int) -> jax.Array:
    """Fully unrolled ascending bitonic sort along the last axis (size ``w``).

    Each (k, j) step exchanges lane ``i`` with ``i ^ j``; the comparison
    direction flips per ``k``-block.  All masks are numpy constants.
    """
    # lane indices generated in-kernel (Pallas kernels cannot capture array
    # constants; iota + bitwise masks fold to the same thing)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    k = 2
    while k <= w:
        j = k // 2
        while j >= 1:
            bit_j = (lanes & j) != 0  # which element of each pair am I
            asc = (lanes & k) == 0  # block direction for this k-stage
            # pltpu.roll requires non-negative shifts: roll by j and by w-j
            partner = jnp.where(bit_j, pltpu.roll(x, j, 1), pltpu.roll(x, w - j, 1))
            mn = jnp.minimum(x, partner)
            mx = jnp.maximum(x, partner)
            # ascending block: low index keeps min; descending: keeps max
            keep_min = asc ^ bit_j
            x = jnp.where(keep_min, mn, mx)
            j //= 2
        k *= 2
    return x


def _bitonic_sort_block_axis0(x: jax.Array, w: int) -> jax.Array:
    """Ascending bitonic sort along axis 0 of ``[w, ...]`` (leading axis).

    Same network as :func:`_bitonic_sort_block` with the compare-exchange
    running across the untiled leading dimension — the layout used when the
    sorted axis must accept dynamic writes (lane dims cannot).
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, (w,) + (1,) * (x.ndim - 1), 0)
    k = 2
    while k <= w:
        j = k // 2
        while j >= 1:
            bit_j = (lanes & j) != 0
            asc = (lanes & k) == 0
            partner = jnp.where(bit_j, pltpu.roll(x, j, 0), pltpu.roll(x, w - j, 0))
            mn = jnp.minimum(x, partner)
            mx = jnp.maximum(x, partner)
            keep_min = asc ^ bit_j
            x = jnp.where(keep_min, mn, mx)
            j //= 2
        k *= 2
    return x


def _rank_kernel(x_ref, out_ref, *, w: int, k_idx: int):
    sorted_x = _bitonic_sort_block(x_ref[:], w)
    out_ref[:] = sorted_x[:, k_idx][:, None]


@partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def kth_smallest(
    train: jax.Array, k: int, *, tile: int = 256, interpret: bool = False
) -> jax.Array:
    """k-th smallest (1-based) along the last axis of ``[M, W]`` via Pallas.

    Pads ``W`` to a power of two with ``+inf`` and ``M`` to a tile multiple;
    returns ``[M]`` float32.  Set ``interpret=True`` to run the kernel in
    interpreter mode (CPU tests).
    """
    m, w_in = train.shape
    w = max(_next_pow2(w_in), 128)
    m_pad = ((m + tile - 1) // tile) * tile

    x = jnp.full((m_pad, w), jnp.inf, jnp.float32)
    x = x.at[:m, :w_in].set(train.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_rank_kernel, w=w, k_idx=k - 1),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out[:m, 0]
