"""Within-process A/B: K-chunk mega-dispatch vs single-batch dispatch.

Round-4 experiment for the 2.389 ms fixed per-program cost of the tunneled
axon runtime (PEAKS_MEASURED.json; 41% of the north-star dispatch at batch
1024).  For each K in ``--chunk-list`` the SAME process builds
``chunk_dispatch(pipeline, K)`` (one ``lax.scan`` over K chunks of
``--batch`` frames, ``parallel/pipeline.py``), times it with the fetch-fence
protocol, and prints one JSON line — within-run comparisons are the reliable
ones (tunnel sessions vary ~20% between processes, BENCH_SELF.md).

Usage:
    python scripts/ab_chunks.py --metric pointcloud --chunk-list 1,2,4,8
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from bench import AZ_IDXS, CFAR_PARAMS, EL_IDXS, _flagship_config  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metric", default="pointcloud",
                        choices=["pointcloud", "velocity", "combined",
                                 "capon", "bartlett"])
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--chunk-list", default="1,2,4,8")
    parser.add_argument("--iters", type=int, default=60,
                        help="dispatches timed at K=1; scaled down as "
                             "ceil(iters/K) for larger K so every row times "
                             "a comparable number of frames")
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()
    chunk_list = [int(c) for c in args.chunk_list.split(",")]

    import jax

    cache_dir = os.path.join(_HERE, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from mmwave_radar_processing_tpu.parallel.pipeline import (
        build_point_cloud_pipeline,
        chunk_dispatch,
    )

    cfg = _flagship_config()
    if args.metric == "pointcloud":
        base = build_point_cloud_pipeline(
            cfg, az_antenna_idxs=AZ_IDXS, el_antenna_idxs=EL_IDXS,
            cfar_params=CFAR_PARAMS, max_dets=128, backend="mxu",
        )
        needs_alt = False
    elif args.metric == "velocity":
        from mmwave_radar_processing_tpu.parallel.velocity_pipeline import (
            build_velocity_pipeline,
        )

        base = build_velocity_pipeline(cfg)
        needs_alt = True
    elif args.metric == "combined":
        from mmwave_radar_processing_tpu.parallel.full_pipeline import (
            build_full_pipeline,
        )

        base = build_full_pipeline(cfg)
        needs_alt = True
    else:
        from mmwave_radar_processing_tpu.parallel.capon_pipeline import (
            build_capon_pipeline,
        )

        base = build_capon_pipeline(cfg, antenna_idxs=AZ_IDXS,
                                    method=args.metric)
        needs_alt = False

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        return np.asarray(leaf.reshape(-1)[0])

    results = []
    for k in chunk_list:
        total = args.batch * k
        shape = (total, cfg.num_rx_antennas, cfg.num_adc_samples,
                 cfg.chirps_per_frame)
        sets = []
        for seed in (0, 1):
            rng = np.random.default_rng(seed)
            a = (jax.device_put(rng.standard_normal(shape).astype(np.float32)),
                 jax.device_put(rng.standard_normal(shape).astype(np.float32)))
            if needs_alt:
                a = a + (jax.device_put(np.full(total, 1.2, np.float32)),)
            sets.append(a)

        fn = chunk_dispatch(base, k)
        t0 = time.perf_counter()
        fence(fn(*sets[0]))  # warmup: compile + one execution
        compile_s = time.perf_counter() - t0

        iters = max(4, -(-args.iters // k))
        best = 0.0
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            out = None
            for i in range(iters):
                out = fn(*sets[i % 2])
            fence(out)
            dt = time.perf_counter() - t0
            best = max(best, iters * total / dt)

        row = {
            "metric": args.metric,
            "chunks": k,
            "batch": args.batch,
            "frames_per_dispatch": total,
            "iters": iters,
            "frames_per_s": round(best, 1),
            "ms_per_dispatch": round(total / best * 1e3, 3),
            "ms_per_chunk": round(total / best * 1e3 / k, 3),
            "warmup_s": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del sets, fn

    base_row = next((r for r in results if r["chunks"] == 1), None)
    if base_row:
        for r in results:
            r["speedup_vs_k1"] = round(
                r["frames_per_s"] / base_row["frames_per_s"], 3)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
