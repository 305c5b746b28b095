"""Within-process A/B: Capon solve formulations on the chip (round 4).

``linv``: unrolled L^{-1} + one batched MXU matmul (a^H R^-1 a = |L^-1 a|^2).
``solve``: round-2/3 unrolled Cholesky substitution on the broadcast RHS.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from bench import AZ_IDXS, _flagship_config  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from mmwave_radar_processing_tpu.parallel.capon_pipeline import (
        build_capon_pipeline,
    )

    cfg = _flagship_config()
    shape = (args.batch, cfg.num_rx_antennas, cfg.num_adc_samples,
             cfg.chirps_per_frame)
    sets = []
    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        sets.append((
            jax.device_put(rng.standard_normal(shape).astype(np.float32)),
            jax.device_put(rng.standard_normal(shape).astype(np.float32)),
        ))

    def fence(out):
        return np.asarray(jax.tree_util.tree_leaves(out)[-1].reshape(-1)[0])

    rows = []
    for cm in ("solve", "linv"):
        fn = build_capon_pipeline(cfg, antenna_idxs=AZ_IDXS, method="capon",
                                  capon_method=cm)
        t0 = time.perf_counter()
        fence(fn(*sets[0]))
        warm = time.perf_counter() - t0
        best = 0.0
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = fn(*sets[i % 2])
            fence(out)
            best = max(best,
                       args.iters * args.batch / (time.perf_counter() - t0))
        row = {"capon_method": cm, "frames_per_s": round(best, 1),
               "ms_per_dispatch": round(args.batch / best * 1e3, 3),
               "warmup_s": round(warm, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        del fn
    print(json.dumps({"summary": rows}), flush=True)


if __name__ == "__main__":
    main()
