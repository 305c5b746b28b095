"""Velocity-pipeline stage bisection on the chip (round 5).

Cumulative prefixes via the ``stop_after`` knob: responses / +vx / +peaks /
full, N=60 fetch-fence protocol.  Round-5 table: 9.5 / 9.8 / 13.8 / 19.1 ms
before the RANSAC de-scatter + candidate prominences (-> 14.7 ms).
"""

import json, os, sys, time
import numpy as np
_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _HERE)
from bench import _flagship_config
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from mmwave_radar_processing_tpu.parallel.velocity_pipeline import build_velocity_pipeline

cfg = _flagship_config()
B = 1024
shape = (B, cfg.num_rx_antennas, cfg.num_adc_samples, cfg.chirps_per_frame)
sets = []
for seed in (0, 1):
    g = np.random.default_rng(seed)
    sets.append((jax.device_put(g.standard_normal(shape).astype(np.float32)),
                 jax.device_put(g.standard_normal(shape).astype(np.float32)),
                 jax.device_put(np.full(B, 1.2, np.float32))))
def fence(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[-1].reshape(-1)[0])
import sys as _s
stages = _s.argv[1].split(",") if len(_s.argv) > 1 else ["responses","vx","peaks",None]
for stop in stages:
    if stop == "None": stop = None
    fn = build_velocity_pipeline(cfg, stop_after=stop)
    t0 = time.perf_counter(); fence(fn(*sets[0])); warm = time.perf_counter()-t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); out = None
        for i in range(60): out = fn(*sets[i % 2])
        fence(out)
        dt = (time.perf_counter()-t0)/60*1e3
        best = dt if best is None else min(best, dt)
    print(json.dumps({"stage": stop or "full", "ms": round(best,3),
                      "fps": round(B/best*1e3,1), "warm_s": round(warm,1)}), flush=True)
