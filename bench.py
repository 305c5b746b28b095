"""North-star benchmark: radar frames/s/chip for range-Doppler + CFAR + AoA.

Runs the fused point-cloud pipeline (virtual-array reformat -> windowed
range-Doppler FFT over all 12 virtual channels -> OS-CFAR 2D -> per-detection
AoA FFTs -> cartesian points) on the flagship 6843 ODS 20 Hz config over a
batch of simulated frames, on the default JAX device (the real TPU chip under
the driver; CPU if forced).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference library publishes no benchmark numbers (BASELINE.md);
``vs_baseline`` divides by the *matching* reference numpy workload timed on
this container's CPU and persisted in ``BASELINE_MEASURED.json``
(``python bench.py --measure-baseline`` re-times all of them; see
``BASELINE_WORKLOADS`` for the metric -> reference-loop mapping).  Metrics
with no reference counterpart (capon, bartlett) print ``vs_baseline: null``.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_MEASURED_PATH = os.path.join(_HERE, "BASELINE_MEASURED.json")

CFAR_PARAMS = dict(num_train=(5, 5), num_guard=(3, 2), rho=0.7, alpha=4.0)
AZ_IDXS, EL_IDXS = (0, 3, 4, 7), (9, 8, 5, 4)

# Logical batches per program execution (parallel/pipeline.chunk_dispatch).
# All 1: the round-4 within-process A/B (BENCH_SELF.md "mega-dispatch
# falsification") measured scan-chunking at 0.57-0.675x, unrolled chunking
# at 0.90x, and a fully dependent chain equal to independent dispatches —
# there is no serialized per-dispatch overhead for a mega-dispatch to
# reclaim (the old 2.39 ms calibration intercept was mostly fence-fetch
# measurement artifact; the real per-program cost is ~0.44 ms and already
# overlaps).  `--chunks` stays available for future runtimes where the
# trade-off differs; `ground` is a stateful temporal scan and never chunks.
CHUNK_DEFAULTS = {"pointcloud": 1, "velocity": 1, "combined": 1,
                  "capon": 1, "bartlett": 1, "ground": 1}

# Which reference workload each metric's ``vs_baseline`` divides by.  Metrics
# absent here (capon/bartlett) have NO reference counterpart — their ratio is
# printed as null rather than against an unrelated workload.
BASELINE_WORKLOADS = {
    "pointcloud": "reference VirtualArrayReformatter + "
                  "RangeDopplerDetector2D[os_cfar_2d] + PointCloudGenerator",
    "velocity": "reference VirtualArrayReformatter + "
                "VelocityEstimator.process(adc_cube, altitude) ODS ADC path",
    "combined": "reference VirtualArrayReformatter + PointCloudGenerator"
                "[os_cfar_2d] + VelocityEstimator ADC path per frame",
    "ground": "reference VirtualArrayReformatter + PointCloudGenerator"
              "[range_doppler_ground_detector] (stateful altimeter gate)",
}


def _flagship_config():
    from mmwave_radar_processing_tpu.config import load_cfg

    path = os.path.join(_HERE, "configs", "6843_RadVel_ods_20Hz.cfg")
    return load_cfg(path, array_geometry="ods", array_direction="down")


def _reference_processors():
    """Reference-library processors on the flagship config (CPU numpy)."""
    sys.path.insert(0, "/root/reference")
    from mmwave_radar_processing.config_managers.cfgManager import ConfigManager
    from mmwave_radar_processing.processors.virtual_array_reformater import (
        VirtualArrayReformatter,
    )
    from mmwave_radar_processing.processors.point_cloud_generator import (
        PointCloudGenerator,
    )
    from mmwave_radar_processing.processors.velocity_estimator import (
        VelocityEstimator,
    )

    cfg = ConfigManager()
    cfg.load_cfg(os.path.join(_HERE, "configs", "6843_RadVel_ods_20Hz.cfg"),
                 "ods", "down")
    var = VirtualArrayReformatter(cfg)
    pcg = PointCloudGenerator(
        cfg, az_antenna_idxs=list(AZ_IDXS), el_antenna_idxs=list(EL_IDXS),
        detector_type="range_doppler_detector_2d",
        detector_params=dict(cfar_type="os_cfar_2d", cfar_params=CFAR_PARAMS),
    )
    # ground-detector params from the reference's shipped
    # analyzer_configs/velocity_analysis_config.yaml:16-30
    pcg_ground = PointCloudGenerator(
        cfg, az_antenna_idxs=list(AZ_IDXS), el_antenna_idxs=list(EL_IDXS),
        detector_type="range_doppler_ground_detector",
        detector_params=dict(
            vel_cfar_type="os_cfar_1d",
            vel_cfar_params=dict(num_train=5, num_guard=2, rho=0.6, alpha=4),
            altimeter_params=dict(
                min_altitude_m=0.25, zoom_search_region_m=0.2,
                altitude_search_limit_m=0.4, range_bias=0.0,
                precise_est_enabled=True,
            ),
        ),
    )
    ve = VelocityEstimator(cfg, lower_range_bound=0.5, upper_range_bound=0.5)
    return var, pcg, pcg_ground, ve


def measure_reference_baselines(n: int = 40) -> dict:
    """Time the reference numpy workloads on CPU (requires /root/reference).

    One entry per metric in :data:`BASELINE_WORKLOADS`; each is the matching
    reference loop timed per frame on identical simulated cubes (reference
    ``scripts/test_vel_estimation.py:145-176`` is the velocity-loop model).
    """
    var, pcg, pcg_ground, ve = _reference_processors()
    rng = np.random.default_rng(0)
    frames = [
        rng.standard_normal((4, 63, 210)) + 1j * rng.standard_normal((4, 63, 210))
        for _ in range(8)
    ]
    virt = [var.process(f) for f in frames]

    def timed(fn, n_iter=n):
        fn(0)  # warmup (fills any internal state/caches)
        t0 = time.perf_counter()
        for i in range(n_iter):
            fn(i)
        return n_iter / (time.perf_counter() - t0)

    out = {}
    out["pointcloud"] = timed(lambda i: pcg.process(var.process(frames[i % 8])))
    out["velocity"] = timed(
        lambda i: ve.process(adc_cube=virt[i % 8], altitude=1.2) is not None
        and var.process(frames[i % 8]) is not None
    )
    out["combined"] = timed(
        lambda i: (
            lambda v: (pcg.process(v), ve.process(adc_cube=v, altitude=1.2))
        )(var.process(frames[i % 8]))
    )
    out["ground"] = timed(
        lambda i: pcg_ground.process(var.process(frames[i % 8]))
    )
    return out


def write_measured_baselines(n: int = 40) -> dict:
    """Measure and persist the per-metric reference baselines."""
    import platform

    vals = measure_reference_baselines(n)
    doc = {
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "host": platform.node(),
        "n_frames": n,
        "baselines": {
            k: {"frames_per_s": round(v, 2), "workload": BASELINE_WORKLOADS[k]}
            for k, v in vals.items()
        },
    }
    with open(BASELINE_MEASURED_PATH, "w") as f:
        json.dump(doc, f, indent=1)
    return doc


def load_measured_baseline(metric: str):
    """(frames_per_s, workload) for ``metric``, or (None, reason)."""
    if metric not in BASELINE_WORKLOADS:
        return None, "no reference counterpart for this workload"
    try:
        with open(BASELINE_MEASURED_PATH) as f:
            doc = json.load(f)
        entry = doc["baselines"][metric]
        return float(entry["frames_per_s"]), entry["workload"]
    except (OSError, KeyError, ValueError):
        return None, ("no measured baseline on record — run "
                      "`python bench.py --measure-baseline`")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=60,
                        help="dispatches per timing repetition; the single "
                             "fence fetch (~40 ms round trip) is amortized "
                             "over all of them, so small N inflates the "
                             "per-dispatch time (N=20, the round-1/2 "
                             "protocol, charged ~1.3 ms/dispatch of fetch "
                             "latency to the pipeline)")
    parser.add_argument("--repeats", type=int, default=3,
                        help="timing repetitions; best (max frames/s) wins — "
                             "single runs through the tunnel vary ~20%; every "
                             "repeat is recorded in the JSON")
    parser.add_argument("--health-retries", type=int, default=2,
                        help="re-time attempts when the capture looks "
                             "degraded (tunnel probe >3x calibrated program "
                             "cost, or >3x below the known-good record, or "
                             ">6x the analytic floor); the final JSON carries "
                             "degraded_run=true if every attempt stayed "
                             "anomalous (utils/bench_health.py — guards "
                             "against the BENCH_r04 silent 16x capture)")
    parser.add_argument("--no-health", action="store_true",
                        help="skip tunnel-health probing/retries (debug runs)")
    parser.add_argument("--update-expected", action="store_true",
                        help="persist this run's frames/s as the known-good "
                             "record in HEALTH_EXPECTED.json (only if the "
                             "run itself was healthy)")
    parser.add_argument("--chunks", type=int, default=None,
                        help="logical batches per program execution "
                             "(lax.scan mega-dispatch, "
                             "parallel/pipeline.chunk_dispatch); default: "
                             "per-metric tuned value from CHUNK_DEFAULTS")
    parser.add_argument("--metric",
                        choices=["pointcloud", "velocity", "combined", "ground",
                                 "capon", "bartlett", "scaling"],
                        default="pointcloud",
                        help="pointcloud: RD+CFAR+AoA north star; "
                             "velocity: fused RadVel ego-velocity pipeline; "
                             "combined: point clouds + ego-velocity per frame; "
                             "ground: stateful altimeter-gated ground scan; "
                             "capon/bartlett: covariance beamforming "
                             "range-azimuth heatmaps; "
                             "scaling: samples/s vs devices table (uses an "
                             "8-device virtual CPU mesh when only one real "
                             "chip is attached)")
    parser.add_argument("--measure-baseline", action="store_true",
                        help="re-time the reference CPU workloads and persist "
                             "BASELINE_MEASURED.json, then exit")
    parser.add_argument("--calibrate", action="store_true",
                        help="measure achievable HBM GB/s and f32 TFLOP/s on "
                             "the attached chip, persist PEAKS_MEASURED.json, "
                             "then exit")
    parser.add_argument("--verify", action="store_true",
                        help="run every fused pipeline on identical simulated "
                             "inputs on the default device AND a CPU-oracle "
                             "subprocess, record per-leaf deltas in "
                             "VERIFY_MEASURED.json, exit nonzero on "
                             "disagreement (utils/verify.py)")
    parser.add_argument("--verify-metrics", default=None,
                        help="comma list of metrics for --verify "
                             "(default: all fused pipelines)")
    parser.add_argument("--verify-dump", default=None, metavar="NPZ",
                        help="internal: compute the oracle outputs on THIS "
                             "process's backend and save to NPZ, then exit "
                             "(spawned with JAX_PLATFORMS=cpu by --verify)")
    parser.add_argument("--peak-tflops", type=float, default=None,
                        help="chip float32 matmul peak for MFU (default: "
                             "TPU v5e-class 49 f32 TFLOP/s)")
    parser.add_argument("--peak-gbs", type=float, default=None,
                        help="chip HBM bandwidth peak in GB/s (default: "
                             "TPU v5e 819)")
    args = parser.parse_args()

    if args.measure_baseline:
        doc = write_measured_baselines()
        for k, v in doc["baselines"].items():
            print(f"reference CPU {k}: {v['frames_per_s']:.2f} frames/s",
                  file=sys.stderr)
        print(f"persisted to {BASELINE_MEASURED_PATH}", file=sys.stderr)
        print(json.dumps(doc))
        return

    import jax

    if args.verify_dump:
        # CPU-oracle subprocess: the parent set JAX_PLATFORMS=cpu before
        # spawn, so the sitecustomize jax import already picked CPU; pin the
        # config too for belt-and-braces (backends initialize lazily).
        from mmwave_radar_processing_tpu.utils import verify as verify_mod

        jax.config.update("jax_platforms", "cpu")
        metrics = (args.verify_metrics.split(",") if args.verify_metrics
                   else list(verify_mod.VERIFY_METRICS))
        verify_mod.dump_oracle(metrics, batch=min(args.batch, 32),
                               out_npz=args.verify_dump)
        return

    if args.verify:
        from mmwave_radar_processing_tpu.utils import verify as verify_mod

        cache_dir = os.path.join(_HERE, ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        metrics = (args.verify_metrics.split(",") if args.verify_metrics
                   else list(verify_mod.VERIFY_METRICS))
        report = verify_mod.run_verify(
            metrics, batch=min(args.batch, 32),
            out_path=os.path.join(_HERE, "VERIFY_MEASURED.json"))
        worst = min((l.get("agree_frac", 1.0) for l in report["leaves"]),
                    default=1.0)
        print(json.dumps({
            "metric": "on-chip parity vs CPU oracle (min leaf agreement)",
            "value": round(worst, 5),
            "unit": "fraction",
            "vs_baseline": None,
            "ok": report["ok"],
            "device": report["device"],
            "n_leaves": len(report["leaves"]),
            "detail": "VERIFY_MEASURED.json",
        }))
        sys.exit(0 if report["ok"] else 1)

    if args.calibrate:
        from mmwave_radar_processing_tpu.utils.roofline import measure_peaks

        peaks = measure_peaks()
        peaks["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(os.path.join(_HERE, "PEAKS_MEASURED.json"), "w") as f:
            json.dump(peaks, f, indent=1)
        print(json.dumps(peaks))
        return

    if args.metric == "scaling":
        # Multi-device measurement: with a single attached chip, fall back to
        # an 8-device virtual CPU mesh (backends initialize lazily, so
        # switching platforms here — before any device computation — is safe;
        # same approach as tests/conftest.py).
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        run_scaling(args)
        return

    # Remote-compile TPU tunnels take minutes per program; the persistent
    # cache makes repeat runs (and the driver's run) start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from mmwave_radar_processing_tpu.parallel.pipeline import (
        build_point_cloud_pipeline,
    )

    cfg = _flagship_config()
    chunks = args.chunks if args.chunks is not None else CHUNK_DEFAULTS.get(
        args.metric, 1)
    if args.metric == "ground":
        chunks = 1  # stateful temporal scan: chunking would reset state
    total_batch = args.batch * max(1, chunks)
    rng = np.random.default_rng(0)
    shape = (total_batch, cfg.num_rx_antennas, cfg.num_adc_samples,
             cfg.chirps_per_frame)
    raw_re = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    raw_im = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    # MXU backend: split-complex DFT matmuls, no complex dtypes on device
    if args.metric == "pointcloud":
        fn = build_point_cloud_pipeline(
            cfg, az_antenna_idxs=AZ_IDXS, el_antenna_idxs=EL_IDXS,
            cfar_params=CFAR_PARAMS, max_dets=128, backend="mxu",
        )
        bench_args = (raw_re, raw_im)
        metric_name = "radar frames/s/chip (range-Doppler+CFAR+AoA)"
    elif args.metric == "velocity":
        from mmwave_radar_processing_tpu.parallel.velocity_pipeline import (
            build_velocity_pipeline,
        )

        fn = build_velocity_pipeline(cfg)
        altitudes = jax.device_put(np.full(total_batch, 1.2, np.float32))
        bench_args = (raw_re, raw_im, altitudes)
        metric_name = "radar frames/s/chip (fused RadVel ego-velocity)"
    elif args.metric == "combined":
        from mmwave_radar_processing_tpu.parallel.full_pipeline import (
            build_full_pipeline,
        )

        fn = build_full_pipeline(cfg)
        altitudes = jax.device_put(np.full(total_batch, 1.2, np.float32))
        bench_args = (raw_re, raw_im, altitudes)
        metric_name = "radar frames/s/chip (point clouds + ego-velocity)"
    elif args.metric in ("capon", "bartlett"):
        from mmwave_radar_processing_tpu.parallel.capon_pipeline import (
            build_capon_pipeline,
        )

        fn = build_capon_pipeline(cfg, antenna_idxs=AZ_IDXS, method=args.metric)
        bench_args = (raw_re, raw_im)
        metric_name = (f"radar frames/s/chip ({args.metric} covariance "
                       "beamforming heatmaps)")
    else:  # ground: one lax.scan over the recording (stateful altimeter gate)
        from mmwave_radar_processing_tpu.parallel.ground_pipeline import (
            build_ground_point_cloud_pipeline,
        )

        fn = build_ground_point_cloud_pipeline(cfg)
        bench_args = (raw_re, raw_im)
        metric_name = "radar frames/s/chip (altimeter-gated ground scan)"

    if chunks > 1:
        from mmwave_radar_processing_tpu.parallel.pipeline import chunk_dispatch

        fn = chunk_dispatch(fn, chunks)

    # Timing protocol: on the tunneled axon runtime, execution is fully async
    # and ``block_until_ready`` resolves without waiting for the device — only
    # a host fetch fences.  So: enqueue ``iters`` back-to-back dispatches
    # (alternating two input sets to defeat any result reuse), then fetch one
    # scalar element of the last output; the FIFO execution queue makes that
    # fence cover every enqueued call.  The ~40 ms fetch round-trip is
    # amortized over the batch of calls — it is measurement apparatus, not
    # pipeline cost, so the window must be wide: at the round-1/2 default of
    # 20 dispatches the fetch charged ~1.3 ms/dispatch to the pipeline
    # (north star measured 152.7k frames/s at N=20 vs 174.8k at N=60,
    # BENCH_SELF.md "protocol note").
    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        return np.asarray(leaf.reshape(-1)[0])

    # Inspect dtype/ndim on the jax Array directly — np.asarray(a) would
    # host-fetch the full device-resident cubes through the slow tunnel.
    rng2 = np.random.default_rng(1)
    alt_args = tuple(
        jax.device_put(rng2.standard_normal(a.shape).astype(a.dtype))
        if np.issubdtype(a.dtype, np.floating) and a.ndim > 1
        else a
        for a in bench_args
    )
    arg_sets = [bench_args, alt_args]

    fence(fn(*bench_args))  # warmup: compile + one real execution

    # Cost analysis up front: the analytic-floor health check and the
    # roofline fields share it (compile is cached, lower+compile is cheap).
    flops_pd, ca_bytes_pd, cost_source = _cost_analysis(fn, bench_args)
    input_bytes_pd = sum(
        a.size * a.dtype.itemsize for a in bench_args if hasattr(a, "dtype"))

    from mmwave_radar_processing_tpu.utils import bench_health

    def timer():
        times = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = fn(*arg_sets[i % 2])
            fence(out)
            times.append(time.perf_counter() - t0)
        return times

    if args.no_health:
        fps = [args.iters * total_batch / t for t in timer()]
        health = {
            "frames_per_s": round(max(fps), 1),
            "per_repeat_frames_per_s": [round(f, 1) for f in fps],
            "degraded_run": None,
        }
    else:
        health = bench_health.timed_with_health(
            timer, batch=total_batch, iters=args.iters, metric=args.metric,
            flops_per_dispatch=flops_pd,
            input_bytes_per_dispatch=input_bytes_pd,
            platform=jax.default_backend(),
            max_retries=max(0, args.health_retries))
    best = health.pop("frames_per_s")

    # the record updates only from a run the health checks actually PASSED
    # (degraded_run False, not the None a --no-health run reports) — else an
    # unchecked degraded capture could poison the known-good record and
    # defeat the 3x-below-record criterion for every future run
    if args.update_expected and health.get("degraded_run") is False:
        bench_health.update_expected(args.metric, total_batch, best,
                                     platform=jax.default_backend())
        print(f"HEALTH_EXPECTED.json updated: {args.metric} = {best:.1f} "
              f"frames/s @ batch {total_batch}", file=sys.stderr)

    base_fps, base_note = load_measured_baseline(args.metric)
    result = {
        "metric": metric_name,
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(best / base_fps, 2) if base_fps else None,
        "baseline_frames_per_s": base_fps,
        "baseline_workload": base_note,
    }
    result.update(health)
    if chunks > 1:
        result["chunks_per_dispatch"] = chunks
    result.update(
        _roofline_fields(fn, bench_args, args, cfg, best,
                         frames_per_dispatch=total_batch,
                         precomputed=(flops_pd, ca_bytes_pd, cost_source)))
    print(json.dumps(result))


def run_scaling(args) -> None:
    """samples/s-vs-devices tables for the sharded pipelines (weak scaling).

    Prints one JSON line whose ``value`` is the combined-pipeline parallel
    efficiency at the largest device count (north star: >= 0.80 at 1 -> N
    hosts); the full per-pipeline tables ride in the ``table`` field.  On
    this container only a virtual CPU mesh is available, so the number is a
    software-overhead proxy — the harness itself is hardware-ready.
    """
    from mmwave_radar_processing_tpu.parallel.scaling import measure_scaling

    cfg = _flagship_config()
    # modest sizes: this is a structural/overhead proxy on shared-core
    # virtual devices — the combined pipeline runs ~100 frames/s/core on CPU,
    # so inheriting the TPU batch/iters would take tens of minutes
    table = measure_scaling(
        cfg, per_device_batch=max(1, min(args.batch, 512) // 16),
        iters=min(args.iters, 3),
    )
    # headline: the feed-INCLUSIVE serving pipeline (SURVEY §5.8 multi-host
    # input feed) at the largest device count
    head = table.get("combined_with_feed", table["combined"])
    eff = head["efficiency"][-1]
    n_max = head["devices"][-1]
    proj = table.get("ici_projection", {})
    result = {
        "metric": f"samples/s scaling efficiency 1->{n_max} devices "
                  "(combined pipeline incl. input feed, weak scaling)",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.80, 2),  # vs the >=80% north-star bar
        "input_feed_included": bool(head.get("input_feed_included",
                                             [False])[-1]),
        "core_oversubscribed": bool(head.get("core_oversubscribed",
                                             [False])[-1]),
        "physical_cores": table.get("meta", {}).get("physical_cores"),
        # falsifiable model prediction for real ICI hardware (the virtual
        # CPU mesh only measures core contention past n=cores):
        # parallel/scaling.predict_ici_efficiency, assumptions stated inside
        "predicted_ici_efficiency_min": proj.get("min_predicted_efficiency"),
        "predicted_meets_80pct_bar": proj.get("meets_80pct_bar"),
        "table": table,
    }
    print(json.dumps(result))


def _cost_analysis(fn, bench_args):
    """(flops, "bytes accessed", source) per dispatch from the compiled HLO.

    Returns (None, None, source) when the plugin doesn't expose
    ``cost_analysis`` — callers fall back to the analytic models.
    """
    try:
        ca = fn.lower(*bench_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]), float(ca["bytes accessed"]), \
            "xla_cost_analysis"
    except Exception:
        return None, None, "analytic_model"


def _roofline_fields(fn, bench_args, args, cfg, frames_per_s,
                     frames_per_dispatch=None, precomputed=None) -> dict:
    """MFU / roofline accounting for the timed pipeline.

    FLOP and HBM-byte counts come from the compiled executable's own
    ``cost_analysis()`` (exact for the HLO that actually ran — verified
    available through the axon PJRT tunnel); if the plugin doesn't expose it,
    falls back to the analytic models in ``utils/roofline.py``.  Peaks
    default to the attached chip class (TPU v5e: ~49 f32 TFLOP/s MXU,
    819 GB/s HBM) and are overridable via ``--peak-tflops`` / ``--peak-gbs``.
    """
    from mmwave_radar_processing_tpu.utils import roofline

    n_frames = frames_per_dispatch or args.batch
    if precomputed is None:
        precomputed = _cost_analysis(fn, bench_args)
    flops_pd, bytes_pd, source = precomputed
    flops_per_frame = bytes_per_frame = None
    if flops_pd is not None:
        flops_per_frame = flops_pd / n_frames
        bytes_per_frame = bytes_pd / n_frames
    else:
        model = roofline.analytic_cost(args.metric, cfg)
        if model is not None:
            flops_per_frame = model.flops_per_frame
            bytes_per_frame = model.bytes_per_frame
    if flops_per_frame is None:
        return {}

    peak_tflops = args.peak_tflops or roofline.DEFAULT_PEAK_F32_TFLOPS
    peak_gbs = args.peak_gbs or roofline.DEFAULT_PEAK_HBM_GBS
    tflops = frames_per_s * flops_per_frame / 1e12
    gbs = frames_per_s * bytes_per_frame / 1e9
    # NB: cost-analysis "bytes accessed" counts every operand touch, so slices
    # that XLA fusion serves from VMEM/registers are billed as HBM traffic —
    # an *upper bound*.  hbm_util > 1 therefore means heavy on-chip reuse
    # (measured on the CFAR shifted-slice stack), not a physics violation.
    fields = {
        "flops_per_frame": round(flops_per_frame),
        "bytes_per_frame": round(bytes_per_frame),
        "tflops": round(tflops, 3),
        "mfu": round(tflops / peak_tflops, 4),
        "hbm_gbs": round(gbs, 2),
        "hbm_util": round(gbs / peak_gbs, 4),
        "bound": roofline.classify_bound(
            tflops, gbs, peak_tflops=peak_tflops, peak_gbs=peak_gbs
        ),
        "cost_source": source,
        "peak_tflops": peak_tflops,
        "peak_gbs": peak_gbs,
    }
    # Calibrated *achievable* peaks (bench.py --calibrate): utilization vs
    # what this chip actually delivers through this dispatch path, not the
    # datasheet upper bound.
    try:
        with open(os.path.join(_HERE, "PEAKS_MEASURED.json")) as f:
            peaks = json.load(f)
        fields["measured_peak_gbs"] = peaks["measured_hbm_gbs"]
        fields["measured_peak_tflops"] = peaks["measured_f32_tflops"]
        fields["hbm_util_vs_measured"] = round(
            gbs / peaks["measured_hbm_gbs"], 4)
        fields["mfu_vs_measured"] = round(
            tflops / peaks["measured_f32_tflops"], 4)
        # fixed per-program cost on this runtime (measured by the calibration
        # fit): the share of each dispatch that no kernel work can reclaim
        if "dispatch_overhead_ms" in peaks:
            fields["dispatch_overhead_ms"] = peaks["dispatch_overhead_ms"]
            fields["dispatch_overhead_share"] = round(
                peaks["dispatch_overhead_ms"] / 1e3
                / (n_frames / frames_per_s), 4)
    except (OSError, KeyError, ValueError):
        pass
    return fields


if __name__ == "__main__":
    main()
