"""Analytic FLOP / HBM-byte cost models for the benchmark pipelines.

``bench.py`` prefers the compiled executable's own ``cost_analysis()`` (exact
for whatever XLA actually emitted); these hand models are the fallback for
runtimes whose PJRT plugin doesn't expose cost analysis (the tunneled axon
single-chip runtime), and the documentation of *where the FLOPs are*.

Conventions:

- A split-complex DFT along an axis is four real ``[B, N] x [N, M]`` matmuls
  (:func:`ops.mxu.dft_apply`): ``8 * B * N * M`` FLOPs.
- Byte counts are *compulsory* HBM traffic only — pipeline input read + final
  output write.  Intermediates (RD cubes, steered snapshots) are assumed
  VMEM-resident/fused; real traffic is therefore >= the model, so the
  reported HBM utilization is a lower bound and the compute/bandwidth
  classification is conservative toward "compute".
- MFU is measured against the float32 matmul peak (all kernels run f32), not
  the bf16 headline number.
"""

from __future__ import annotations

from dataclasses import dataclass

from mmwave_radar_processing_tpu.config import RadarConfig

# Per-chip peaks for MFU/roofline normalization, overridable from bench.py.
# Default: TPU v5e-class — ~197 TFLOP/s bf16 MXU => ~49 TFLOP/s float32;
# 819 GB/s HBM.
DEFAULT_PEAK_F32_TFLOPS = 49.0
DEFAULT_PEAK_HBM_GBS = 819.0


@dataclass(frozen=True)
class CostModel:
    """Per-frame cost of one benchmark pipeline."""

    flops_per_frame: float
    bytes_per_frame: float

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops_per_frame / max(self.bytes_per_frame, 1.0)


def _dft_flops(batch: int, n_in: int, n_out: int) -> float:
    """Split-complex DFT as four real matmuls (ops/mxu.dft_apply)."""
    return 8.0 * batch * n_in * n_out


def _raw_input_bytes(cfg: RadarConfig) -> float:
    """Two float32 planes of the raw ``[rx, ns, nc]`` cube."""
    return 2.0 * 4 * cfg.num_rx_antennas * cfg.num_adc_samples * cfg.chirps_per_frame


def pointcloud_cost(
    cfg: RadarConfig,
    *,
    max_dets: int = 128,
    num_angle_bins: int = 64,
    num_train=(5, 5),
    num_guard=(3, 2),
    n_az: int = 4,
    n_el: int = 4,
) -> CostModel:
    """RD DFTs + counting OS-CFAR + per-detection AoA + cartesian points."""
    v, ns, k = cfg.num_virtual_antennas, cfg.num_adc_samples, cfg.frame.loops
    flops = _dft_flops(v * k, ns, ns)  # windowed range DFT
    flops += _dft_flops(v * ns, k, k)  # Doppler DFT
    flops += 4.0 * ns * k  # magnitude of antenna 0 + squared terms
    # counting CFAR: each CUT compares every training cell and accumulates
    win = (2 * (num_train[0] + num_guard[0]) + 1) * (
        2 * (num_train[1] + num_guard[1]) + 1
    ) - (2 * num_guard[0] + 1) * (2 * num_guard[1] + 1)
    flops += 3.0 * ns * k * win
    # AoA: zero-padded angle DFT per detection, az + el sets
    flops += _dft_flops(max_dets, n_az, num_angle_bins)
    flops += _dft_flops(max_dets, n_el, num_angle_bins)
    flops += 30.0 * max_dets  # |.|^2, argmax, trig, cartesian
    out_bytes = 4.0 * max_dets * 6  # points(4) + valid + count
    return CostModel(flops, _raw_input_bytes(cfg) + out_bytes)


def capon_cost(
    cfg: RadarConfig, *, n_ant: int = 4, num_angle_bins: int = 64
) -> CostModel:
    """Range DFT + per-range-bin covariance + real-embedded Cholesky solve."""
    ns, k, m = cfg.num_adc_samples, cfg.frame.loops, num_angle_bins
    a2 = 2 * n_ant  # real embedding dimension
    flops = _dft_flops(n_ant * k, ns, ns)  # windowed range DFT
    flops += ns * 8.0 * n_ant * n_ant * k  # covariance X X^H (4 matmuls)
    flops += ns * (a2**3) / 3.0  # batched Cholesky
    flops += ns * 2.0 * (a2**2) * m  # two triangular solves for all steerings
    flops += ns * 2.0 * a2 * m  # denominator reduction + reciprocal
    out_bytes = 4.0 * ns * m
    return CostModel(flops, _raw_input_bytes(cfg) + out_bytes)


def bartlett_cost(
    cfg: RadarConfig, *, n_ant: int = 4, num_angle_bins: int = 64
) -> CostModel:
    """Range DFT + fused steering matmuls + snapshot power reduction."""
    ns, k, m = cfg.num_adc_samples, cfg.frame.loops, num_angle_bins
    flops = _dft_flops(n_ant * k, ns, ns)
    flops += ns * 8.0 * m * n_ant * k  # four steering matmuls per range bin
    flops += ns * 3.0 * m * k  # |s|^2 + mean over snapshots
    out_bytes = 4.0 * ns * m
    return CostModel(flops, _raw_input_bytes(cfg) + out_bytes)


def analytic_cost(metric: str, cfg: RadarConfig, **kw) -> "CostModel | None":
    """Fallback dispatch for bench metrics; None when no model exists."""
    if metric == "pointcloud":
        return pointcloud_cost(cfg, **kw)
    if metric == "capon":
        return capon_cost(cfg, **kw)
    if metric == "bartlett":
        return bartlett_cost(cfg, **kw)
    return None


def measure_peaks(
    *,
    bw_mbs=(16, 32, 64, 128, 256, 512, 1024),
    matmul_n: int = 4096,
    iters: int = 60,
    repeats: int = 3,
) -> dict:
    """Calibrated *achievable* peaks on the attached chip (GB/s, TFLOP/s).

    The nominal datasheet peaks (:data:`DEFAULT_PEAK_HBM_GBS`,
    :data:`DEFAULT_PEAK_F32_TFLOPS`) are upper bounds no real program
    reaches; dividing by them understates utilization, and XLA
    ``cost_analysis()`` bytes can exceed them outright (it bills
    fusion-reused operands as HBM traffic).  This microbench measures what
    the chip actually delivers through the same dispatch path the pipelines
    use:

    - **HBM bandwidth**: a streaming ``y = a*x + b`` over float32 arrays of
      each size in ``bw_mbs`` (compulsory traffic = read + write =
      ``2 * bytes``), dependent-chained so calls cannot overlap; the best
      rate across sizes wins (small arrays are dominated by per-dispatch
      overhead — the per-size table is returned so that contamination is
      visible, not hidden).
    - **f32 matmul**: a dependent chain of ``[n, n] x [n, n]`` float32
      matmuls (``2 n^3`` FLOPs each), the MXU's best case.

    Timing uses the axon-correct fetch fence (``block_until_ready`` does not
    block on that runtime): enqueue ``iters`` dependent calls, host-fetch one
    element of the last result.  Best of ``repeats`` (tunnel runs vary ~20%).
    ``iters`` must be large: the single ~25-40 ms fetch round trip amortizes
    over all enqueued calls, so at the old default of 10 it charged ~3 ms to
    every per-dispatch time — which is exactly what round 1-3's
    "2.39 ms fixed dispatch overhead" mostly was (round-4 re-measurement;
    BENCH_SELF.md "the dispatch-overhead correction").
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    def fence(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[-1].reshape(-1)[0])

    def timed(fn, x):
        x = fn(x)  # warmup: compile + execute once
        fence(x)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                x = fn(x)
            fence(x)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    @jax.jit
    def stream(x):
        return x * 1.000001 + 1e-7

    bw_by_size, times, traffics = {}, [], []
    for mb in bw_mbs:
        n_elems = mb * (1 << 20) // 4
        x = jax.device_put(jnp.ones((n_elems,), jnp.float32))
        dt_bw = timed(stream, x)
        traffic = 2.0 * 4.0 * n_elems
        bw_by_size[int(mb)] = round(traffic / dt_bw / 1e9, 1)
        times.append(dt_bw)
        traffics.append(traffic)
    # Fit dt = intercept + bytes/BW: the slope is the *marginal* streaming
    # bandwidth (the honest sustained rate).  The intercept is NOT a pure
    # per-program cost — round-4 falsification (scripts/calibrate_overhead.py,
    # scripts/ab_overhead.py): effective bandwidth genuinely degrades at
    # small sizes, so a sparse sweep inflates the intercept (the original
    # 3-point fit read 2.39 ms where a 7-point fit reads ~0.85 ms).  The
    # per-PROGRAM cost is measured directly below instead.
    slope, intercept = np.polyfit(np.asarray(traffics), np.asarray(times), 1)
    hbm_gbs = 1.0 / slope / 1e9

    # Direct per-program-execution cost: K stream kernels inside ONE program
    # (optimization_barrier defeats fusion into a single read+write) vs K
    # separate dispatches of the same kernel.  saving/(K-1) isolates the
    # fixed cost one program execution carries; measured ~0.4-0.9 ms on the
    # tunneled runtime (round 4), NOT the old intercept's 2.39 ms.
    k_merge = 8
    import jax.lax as lax

    @jax.jit
    def stream_k(x):
        for _ in range(k_merge):
            x = lax.optimization_barrier(x * 1.000001 + 1e-7)
        return x

    n1 = 128 * (1 << 20) // 4
    x1 = jax.device_put(jnp.ones((n1,), jnp.float32))
    t_one = timed(stream, x1)
    t_k = timed(stream_k, x1)
    dispatch_overhead_ms = max(0.0, (k_merge * t_one - t_k) / (k_merge - 1)
                               * 1e3)

    @jax.jit
    def mm(a):
        return (a @ a) * (1.0 / matmul_n)

    a = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (matmul_n, matmul_n)), jnp.float32)
    )
    dt_mm = timed(mm, a)
    tflops = 2.0 * matmul_n**3 / dt_mm / 1e12

    return {
        "measured_hbm_gbs": round(hbm_gbs, 1),
        "measured_f32_tflops": round(tflops, 2),
        "dispatch_overhead_ms": round(dispatch_overhead_ms, 3),
        "overhead_method": (
            f"direct: (K*t1 - tK)/(K-1), K={k_merge} barrier-separated "
            "stream kernels merged into one program (128 MB)"),
        "fit_intercept_ms": round(max(0.0, float(intercept)) * 1e3, 3),
        "hbm_gbs_by_size_mb": bw_by_size,
        "matmul_n": matmul_n,
        "device": str(jax.devices()[0]),
    }


def classify_bound(
    tflops: float,
    gbs: float,
    *,
    peak_tflops: float = DEFAULT_PEAK_F32_TFLOPS,
    peak_gbs: float = DEFAULT_PEAK_HBM_GBS,
) -> str:
    """'compute' / 'bandwidth' / 'dispatch' from achieved vs peak rates.

    If neither engine exceeds 10% of peak the pipeline is dominated by
    dispatch/launch/queue overheads rather than either hardware roof.
    """
    mfu = tflops / peak_tflops
    hbm = gbs / peak_gbs
    if max(mfu, hbm) < 0.10:
        return "dispatch"
    if hbm > 1.0 >= mfu:
        # nominal bytes exceed physical bandwidth: the byte count bills
        # fusion-reused operands (e.g. CFAR's shifted slices) as HBM traffic
        return "bandwidth (nominal bytes; on-chip reuse)"
    return "compute" if mfu >= hbm else "bandwidth"
