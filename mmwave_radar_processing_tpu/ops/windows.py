"""Spectral window constants.

Windows are *static* host-side numpy arrays: their length is always a static
shape at trace time, so baking them in as constants lets XLA fuse the window
multiply into the surrounding FFT kernels for free (no extra HBM traffic).

``hanning``/``hamming`` match ``np.hanning``/``np.hamming`` (symmetric,
M-1 denominator), which is what the reference uses throughout
(e.g. ``range_resp.py:48``, ``range_doppler_resp.py:62-67``,
``simple_synthetic_array_beamformer_processor_multiFrame.py:567``).
"""

from __future__ import annotations

import numpy as np


def hanning(m: int, dtype=np.float32) -> np.ndarray:
    """Symmetric Hann window of length ``m`` (numpy convention)."""
    return np.hanning(m).astype(dtype)


def hamming(m: int, dtype=np.float32) -> np.ndarray:
    """Symmetric Hamming window of length ``m`` (numpy convention)."""
    return np.hamming(m).astype(dtype)


def outer_window(*windows: np.ndarray) -> np.ndarray:
    """Separable multi-axis window as one broadcastable constant.

    ``outer_window(w_range, w_doppler)`` returns a ``(len(w_range),
    len(w_doppler))`` array; multiplying a cube by it applies both windows in a
    single fused elementwise op.
    """
    out = windows[0]
    for w in windows[1:]:
        out = np.multiply.outer(out, w)
    return out
