"""Samples/s-vs-devices scaling harness (the >=80% north-star measurement).

Runs the sharded pipelines at 1/2/4/.../N devices with *weak scaling*
(constant per-device batch) and reports throughput + parallel efficiency
``eff(n) = (samples_per_s(n) / n) / samples_per_s(1)``:

- ``combined`` — the full serving pipeline (point clouds + ego-velocity),
  frame-data-parallel over ``data``; no cross-chip collectives on the hot
  path, so efficiency is bounded only by dispatch and input feed.
- ``halo_cfar_2d`` — range-row-sharded counting OS-CFAR detection whose
  shard boundaries exchange train+guard halos via ``ppermute`` each step.
- ``capon_snapshot`` — Capon heatmaps with the snapshot (chirp) axis sharded;
  partial covariances are all-reduced with one ``[.., A, A]`` ``psum``.

On real multi-chip hardware this measures ICI scaling directly; on the
virtual CPU mesh (`bench.py --metric scaling`) it validates that the sharded
programs execute with the expected collective structure and gives a
software-overhead proxy — virtual devices share physical cores, so CPU
efficiencies under-report what same-topology hardware would deliver.
"""

from __future__ import annotations

import time
from typing import Dict, Sequence

import numpy as np

from mmwave_radar_processing_tpu.config import RadarConfig, grids
from mmwave_radar_processing_tpu.utils.profiling import fence


def _time_fn(fn, args, iters: int) -> float:
    """Median-of-runs wall-clock for ``fn(*args)`` with fetch fencing."""
    fence(fn(*args))  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def measure_scaling(
    cfg: RadarConfig,
    *,
    device_counts: Sequence[int] = (1, 2, 4, 8),
    per_device_batch: int = 64,
    iters: int = 5,
) -> Dict:
    """Weak-scaling table for the three sharded pipelines.

    Returns ``{pipeline: {"devices": [...], "samples_per_s": [...],
    "efficiency": [...]}}`` where efficiency is normalized per-device
    throughput relative to 1 device.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmwave_radar_processing_tpu.ops import beamform as bf
    from mmwave_radar_processing_tpu.parallel.full_pipeline import (
        build_full_pipeline,
    )
    from mmwave_radar_processing_tpu.parallel.halo_cfar import (
        os_cfar_2d_detect_row_sharded,
    )
    from mmwave_radar_processing_tpu.parallel.mesh import make_mesh
    from mmwave_radar_processing_tpu.parallel.sharded_beamform import (
        build_snapshot_sharded_capon,
    )

    avail = jax.devices()
    device_counts = [n for n in device_counts if n <= len(avail)]
    rng = np.random.default_rng(0)
    results: Dict[str, Dict] = {}

    def record(name, n, samples, dt):
        entry = results.setdefault(
            name, {"devices": [], "samples_per_s": [], "efficiency": []}
        )
        sps = samples / dt
        entry["devices"].append(n)
        entry["samples_per_s"].append(round(sps, 1))
        base = entry["samples_per_s"][0] / entry["devices"][0]
        entry["efficiency"].append(round((sps / n) / base, 4))

    # ---- combined serving pipeline, frame-DP ---------------------------- #
    shape1 = (per_device_batch, cfg.num_rx_antennas, cfg.num_adc_samples,
              cfg.chirps_per_frame)
    cfar_params = dict(num_train=(5, 5), num_guard=(3, 2), rho=0.7, alpha=4.0)
    combined = build_full_pipeline(cfg, cfar_params=cfar_params, max_dets=64)
    for n in device_counts:
        mesh = make_mesh({"data": n}, avail[:n])
        sh = NamedSharding(mesh, P("data"))
        sh0 = NamedSharding(mesh, P("data"))
        b = per_device_batch * n
        raw_re = jax.device_put(
            rng.standard_normal((b,) + shape1[1:]).astype(np.float32), sh)
        raw_im = jax.device_put(
            rng.standard_normal((b,) + shape1[1:]).astype(np.float32), sh)
        alts = jax.device_put(np.full(b, 1.2, np.float32), sh0)
        dt = _time_fn(combined, (raw_re, raw_im, alts), iters)
        record("combined", n, b, dt)

    # ---- halo-exchange CFAR (ppermute per step) -------------------------- #
    rows_per_dev = 64
    for n in device_counts:
        mesh = make_mesh({"data": n}, avail[:n])
        x = rng.exponential(1.0, (rows_per_dev * n, 128)).astype(np.float32)
        fn = os_cfar_2d_detect_row_sharded(
            mesh, num_train=(4, 3), num_guard=(2, 1), rho=0.7, alpha=4.0,
            axis="data",
        )
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        with mesh:
            dt = _time_fn(fn, (xs,), iters)
        record("halo_cfar_2d", n, x.shape[0] * x.shape[1], dt)

    # ---- bare collective microbenches ------------------------------------ #
    # per-collective timings at each device count, on the payload sizes the
    # sharded pipelines actually move: the CFAR halo ppermute (train+guard
    # boundary rows) and the beamforming psum ([ns, A] partial sums).  On ICI
    # hardware these are the interconnect costs; on the virtual CPU mesh they
    # time the collective's software path.
    from jax import shard_map

    for n in device_counts:
        if n < 2:
            continue
        mesh = make_mesh({"data": n}, avail[:n])
        perm = [(i, (i + 1) % n) for i in range(n)]
        halo = rng.standard_normal((n * 8, 128)).astype(np.float32)
        part = rng.standard_normal((n, 63, 64)).astype(np.float32)

        pperm = jax.jit(shard_map(
            lambda x: jax.lax.ppermute(x, "data", perm),
            mesh=mesh, in_specs=P("data"), out_specs=P("data")))
        psum = jax.jit(shard_map(
            lambda x: jax.lax.psum(x, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P()))
        xs = jax.device_put(halo, NamedSharding(mesh, P("data", None)))
        ps = jax.device_put(part, NamedSharding(mesh, P("data", None, None)))
        record("ppermute_halo_rows", n, halo.size, _time_fn(pperm, (xs,), iters))
        record("psum_beamform_partials", n, part.size,
               _time_fn(psum, (ps,), iters))

    # ---- snapshot-sharded Capon (psum of partial covariances) ------------ #
    n_bins, n_ant, snaps_per_dev = 64, 12, 32
    steering = bf.steering_ula(grids.phase_shift_bins(64), n_ant)
    for n in device_counts:
        mesh = make_mesh({"model": n}, avail[:n])
        k = snaps_per_dev * n
        xr = rng.standard_normal((n_bins, n_ant, k)).astype(np.float32)
        xi = rng.standard_normal((n_bins, n_ant, k)).astype(np.float32)
        fn = build_snapshot_sharded_capon(mesh, loading=1e-2, axis="model")
        sh = NamedSharding(mesh, P(None, None, "model"))
        args = (jax.device_put(xr, sh), jax.device_put(xi, sh),
                steering.re, steering.im)
        with mesh:
            dt = _time_fn(fn, args, iters)
        record("capon_snapshot", n, n_bins * k, dt)

    return results
