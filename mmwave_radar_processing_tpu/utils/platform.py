"""Runtime platform helpers.

Some TPU runtimes (e.g. tunneled single-chip PJRT plugins such as ``axon``)
do not implement complex dtypes — and a single failed complex op can poison
the device session.  The throughput path
(:mod:`~mmwave_radar_processing_tpu.ops.mxu`, ``bench.py``,
``__graft_entry__.entry``) is split-complex and runs anywhere; the object-API
processors use complex FFT ops and need a backend that supports them.

``ensure_complex_support()`` therefore decides *statically* (platform name,
before any computation touches the device) and falls back to CPU with a
warning.  Call it at the top of analysis scripts.
"""

from __future__ import annotations

import os

from mmwave_radar_processing_tpu.utils.logger import get_logger

# PJRT platforms known to lack complex-dtype support.
_NO_COMPLEX_PLATFORMS = {"axon"}

_checked = False


def platform_supports_complex() -> bool:
    """Static check: does the configured default platform support complex?

    Decided from the requested platform list (env / jax config) without
    executing anything on the device — running a probe op on an unsupported
    backend can wedge the whole session.
    """
    import jax

    requested = (
        str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))
        .split(",")[0]
        .strip()
        .lower()
    )
    return requested not in _NO_COMPLEX_PLATFORMS


def ensure_complex_support() -> str:
    """Switch to CPU if the default backend lacks complex support.

    Must be called before the first device computation (backend selection is
    frozen once a backend initializes).  Returns the platform in use.
    """
    global _checked
    import jax

    if not _checked:
        _checked = True
        if not platform_supports_complex():
            get_logger(__name__).warning(
                "platform %r lacks complex dtype support; falling back to CPU "
                "for the complex-FFT object API (the split-complex MXU "
                "pipeline still runs on the accelerator)",
                jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS"),
            )
            jax.config.update("jax_platforms", "cpu")
    return jax.default_backend()


def complex_safe_device():
    """Context manager pinning computation to a complex-capable device.

    For MIXED flows — e.g. the viewer's precompute cache runs the
    split-complex pipelines on the accelerator while uncovered processors
    fall back to the complex-FFT object API — the fallback must not issue
    complex ops on a complex-free backend (one failed op can poison the
    axon session).  Returns ``jax.default_device(cpu)`` when the default
    platform lacks complex support, else a no-op context.
    """
    import contextlib

    import jax

    if platform_supports_complex():
        return contextlib.nullcontext()
    return jax.default_device(jax.devices("cpu")[0])


def enable_persistent_compile_cache() -> None:
    """Point JAX at the repo-local persistent compilation cache.

    Remote compiles through the tunneled TPU runtime take tens of seconds to
    minutes per program (the fused Capon Pallas kernel alone measured ~18 s
    inside the viewer cache build); ``bench.py`` and ``__graft_entry__``
    already enable this cache, and every other device-facing entry point
    (viewer precompute, scripts) should too.  Safe to call repeatedly and on
    CPU (where it is merely unnecessary).
    """
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
