"""Decompose the 2.389 ms per-dispatch fixed cost: serialized or overlapped?

The calibration fit (``utils/roofline.measure_peaks``) timed DEPENDENT
chains (``x = fn(x)``), where per-execution fixed costs cannot overlap.  The
benchmark protocol enqueues INDEPENDENT dispatches back-to-back — if the
tunneled runtime overlaps its per-execution cost with device compute of the
queued predecessor, the 2.389 ms is already hidden in the steady state and
no mega-dispatch can "reclaim" it.  This experiment separates the cases in
one process:

- ``indep``: the bench protocol (independent dispatches, alternating inputs).
- ``dep``: the same pipeline with a scalar data dependency threaded through
  (execution i+1 consumes a scalar produced by execution i, so the runtime
  cannot overlap executions).  ``dep - indep`` per dispatch measures exactly
  the overlappable share of the fixed cost.  The scalar is folded in with
  cost ~0 (one add on an 8-element leaf).
- ``unroll K``: ``chunk_dispatch_unrolled`` (static slices, no scan
  machinery) for K in 2, 4 — the strongest remaining mega-dispatch form.

Prints one JSON line per row plus a summary.
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
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--unrolls", default="2,4")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from mmwave_radar_processing_tpu.parallel.pipeline import (
        build_point_cloud_pipeline,
        chunk_dispatch_unrolled,
    )

    cfg = _flagship_config()
    base = build_point_cloud_pipeline(
        cfg, az_antenna_idxs=AZ_IDXS, el_antenna_idxs=EL_IDXS,
        cfar_params=CFAR_PARAMS, max_dets=128, backend="mxu",
    )

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        return np.asarray(leaf.reshape(-1)[0])

    def inputs(total, seed):
        rng = np.random.default_rng(seed)
        shape = (total, cfg.num_rx_antennas, cfg.num_adc_samples,
                 cfg.chirps_per_frame)
        return (jax.device_put(rng.standard_normal(shape).astype(np.float32)),
                jax.device_put(rng.standard_normal(shape).astype(np.float32)))

    rows = []

    def report(name, total_frames_per_dispatch, best_fps, extra=None):
        row = {"variant": name,
               "frames_per_dispatch": total_frames_per_dispatch,
               "frames_per_s": round(best_fps, 1),
               "ms_per_dispatch": round(
                   total_frames_per_dispatch / best_fps * 1e3, 3)}
        row.update(extra or {})
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- independent dispatches (bench protocol) --- #
    sets = [inputs(args.batch, 0), inputs(args.batch, 1)]
    fence(base(*sets[0]))
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = base(*sets[i % 2])
        fence(out)
        best = max(best, args.iters * args.batch / (time.perf_counter() - t0))
    report("indep", args.batch, best)

    # --- dependent chain: scalar from execution i feeds execution i+1 --- #
    def dep(raw_re, raw_im, s):
        out = base(raw_re, raw_im)
        count = out.count + (s * 0).astype(out.count.dtype)
        s_next = count[0]
        return out._replace(count=count), s_next

    dep = jax.jit(dep)
    s = jnp.zeros((), jnp.int32)
    out, s = dep(*sets[0], s)
    fence(out)
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out, s = dep(*sets[i % 2], s)
        fence(out)
        best = max(best, args.iters * args.batch / (time.perf_counter() - t0))
    report("dep_chain", args.batch, best)
    del sets

    # --- unrolled mega-dispatch --- #
    for k in [int(x) for x in args.unrolls.split(",") if x]:
        total = args.batch * k
        sets = [inputs(total, 0), inputs(total, 1)]
        fn = chunk_dispatch_unrolled(base, k)
        t0 = time.perf_counter()
        fence(fn(*sets[0]))
        warm = time.perf_counter() - t0
        iters = max(4, -(-args.iters // k))
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = None
            for i in range(iters):
                out = fn(*sets[i % 2])
            fence(out)
            best = max(best, iters * total / (time.perf_counter() - t0))
        report(f"unroll{k}", total, best,
               {"ms_per_chunk": round(total / best * 1e3 / k, 3),
                "warmup_s": round(warm, 1)})
        del sets, fn

    indep = next(r for r in rows if r["variant"] == "indep")
    depr = next(r for r in rows if r["variant"] == "dep_chain")
    print(json.dumps({
        "summary": rows,
        "overlapped_fixed_cost_ms": round(
            depr["ms_per_dispatch"] - indep["ms_per_dispatch"], 3),
        "note": "dep - indep = share of the per-execution fixed cost the "
                "runtime already overlaps across independent queued "
                "dispatches",
    }), flush=True)


if __name__ == "__main__":
    main()
