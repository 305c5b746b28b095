"""Is the 2.389 ms calibration intercept a real per-program cost?

``utils/roofline.measure_peaks`` fits ``time = overhead + bytes/BW`` over a
3-point copy-size sweep and reads the intercept as "fixed per-dispatch
overhead".  Round-4 experiments (scripts/ab_overhead.py) falsified the
reclaimability of that intercept: merging K pipeline executions into one
program never beats K independent dispatches, and a fully dependent chain
costs the same as independent enqueues.  This microbench separates the two
remaining hypotheses at the copy-kernel level:

- **H1 (per-program cost)**: a program containing K sequential 128 MB
  stream kernels (forced distinct with ``lax.optimization_barrier`` so XLA
  cannot fuse the chain into one read+write) should cost
  ``K * marginal - (K-1) * overhead`` less than K separate dispatches.
- **H2 (bandwidth nonlinearity)**: effective copy bandwidth genuinely
  degrades at smaller sizes (tunnel/runtime effects), the linear fit
  manufactures an intercept, and K-in-one-program shows NO saving.

Also widens the size sweep (16..1024 MB) so the curvature is visible.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    def fence(x):
        return np.asarray(x.reshape(-1)[0])

    def timed(fn, x, iters=args.iters):
        y = fn(x)
        fence(y)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            y = x
            for _ in range(iters):
                y = fn(y)
            fence(y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    @jax.jit
    def stream1(x):
        return x * 1.000001 + 1e-7

    out = {"sizes": [], "k_in_one": []}

    # size sweep
    for mb in (16, 32, 64, 128, 256, 512, 1024):
        n = mb * (1 << 20) // 4
        x = jax.device_put(jnp.ones((n,), jnp.float32))
        dt = timed(stream1, x)
        row = {"mb": mb, "ms": round(dt * 1e3, 3),
               "eff_gbs": round(2 * 4 * n / dt / 1e9, 1)}
        out["sizes"].append(row)
        print(json.dumps(row), flush=True)
        del x

    # K stream kernels inside ONE program, barriers defeat fusion
    def make_k(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = jax.lax.optimization_barrier(x * 1.000001 + 1e-7)
            return x
        return f

    n = 128 * (1 << 20) // 4
    x = jax.device_put(jnp.ones((n,), jnp.float32))
    t1 = None
    for k in (1, 2, 4, 8):
        dt = timed(make_k(k), x, iters=max(6, args.iters // k))
        row = {"k": k, "ms": round(dt * 1e3, 3),
               "ms_per_kernel": round(dt * 1e3 / k, 3)}
        if k == 1:
            t1 = dt
        else:
            # saving per merged execution if a fixed per-program cost existed
            row["saving_vs_k_dispatches_ms"] = round((k * t1 - dt) * 1e3, 3)
        out["k_in_one"].append(row)
        print(json.dumps(row), flush=True)

    # fit the widened sweep
    times = np.array([r["ms"] / 1e3 for r in out["sizes"]])
    traff = np.array([2.0 * 4.0 * (r["mb"] * (1 << 20) // 4)
                      for r in out["sizes"]])
    slope, intercept = np.polyfit(traff, times, 1)
    out["fit"] = {"marginal_gbs": round(1 / slope / 1e9, 1),
                  "intercept_ms": round(intercept * 1e3, 3)}
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
