"""Synthetic-aperture beamforming sharded over aperture elements.

The coherent multi-frame aperture grows with ``num_frames * chirps`` elements
— the domain's version of "long context" (SURVEY.md §5.7).  To scale it, the
element axis is sharded over the ``model`` mesh axis: each chip forms the
partial beam sum over its element shard (a local MXU matmul), and one
``psum`` over the ``model`` axis produces the full beamformed response before
the batched range FFT.  ICI traffic is exactly one ``[ns, A]`` complex
all-reduce per dispatch, independent of aperture length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def build_sharded_beamformer(
    mesh: Mesh,
    *,
    lambda_m: float,
    axis: str = "model",
    split_complex: bool = False,
):
    """Build an element-sharded beamformer.

    ``data`` is ``[ns, E]`` and ``positions`` ``[3, E]``, both sharded on the
    element axis; ``steering`` ``[A, 3]`` and the windows are replicated.  The
    returned response is replicated (post-``psum``).

    ``split_complex=True`` takes/returns float32 (re, im) planes and performs
    the range transform as a DFT matmul — for runtimes without complex dtype
    support and for MXU-everything execution
    (:mod:`mmwave_radar_processing_tpu.ops.mxu`).
    """
    if split_complex:
        from mmwave_radar_processing_tpu.ops import mxu

        def local_sc(data_re, data_im, positions, steering, range_window,
                     element_window):
            phase = 2 * jnp.pi * (steering @ positions) / lambda_m  # (A, E)
            ph = mxu.cexp(phase)
            wr = data_re * element_window[None, :]
            wi = data_im * element_window[None, :]
            # (ns, E) @ (E, A) complex matmul as four real matmuls
            part_re = wr @ ph.re.T - wi @ ph.im.T
            part_im = wr @ ph.im.T + wi @ ph.re.T
            bf_re = jax.lax.psum(part_re, axis)
            bf_im = jax.lax.psum(part_im, axis)
            ns = bf_re.shape[0]
            factors = mxu.dft_factors(ns, window=None)
            out = mxu.dft_apply(
                mxu.C2(bf_re * range_window[:, None], bf_im * range_window[:, None]),
                factors,
                axis=0,
            )
            return out.re, out.im

        return jax.jit(
            shard_map(
                local_sc,
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis), P(None, axis),
                          P(None, None), P(None), P(axis)),
                out_specs=(P(None, None), P(None, None)),
            )
        )

    def local(data, positions, steering, range_window, element_window):
        phases = jnp.exp(1j * 2 * jnp.pi * (steering @ positions) / lambda_m)
        partial_sum = (data * element_window[None, :]) @ phases.T  # local MXU matmul
        beamformed = jax.lax.psum(partial_sum, axis)  # one ICI all-reduce
        return jnp.fft.fft(beamformed * range_window[:, None], axis=0)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None, None), P(None), P(axis)),
            out_specs=P(None, None),
        )
    )
