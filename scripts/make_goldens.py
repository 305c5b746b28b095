"""Freeze reference-parity goldens into ``tests/goldens/*.npz``.

Runs every scenario in ``tests/golden_scenarios.py`` against the LIVE
reference checkout (``/root/reference``) on CPU, verifies our own
implementation passes the scenario's compare() against the fresh outputs
(goldens are born green), and writes the reference outputs + the input SHA to
``tests/goldens/<name>.npz``.  ``tests/test_goldens.py`` then asserts parity
with no reference checkout present.

Usage::

    python scripts/make_goldens.py [scenario ...]   # default: all
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"
sys.path.insert(1, REFERENCE_ROOT)


def main():
    from tests.golden_scenarios import GOLDEN_DIR, SCENARIOS, input_sha

    if not os.path.isdir(os.path.join(REFERENCE_ROOT,
                                      "mmwave_radar_processing")):
        sys.exit("reference checkout not available — cannot generate goldens")
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    names = sys.argv[1:] or list(SCENARIOS)
    for name in names:
        sc = SCENARIOS[name]
        t0 = time.time()
        inputs = sc.make_inputs()
        sha = input_sha(inputs)
        want = sc.run_reference(inputs)
        got = sc.run_ours(inputs)
        sc.compare(got, want)  # goldens must be born green
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(
            path, meta_input_sha=np.array(sha),
            meta_generated_at=np.array(time.strftime("%Y-%m-%dT%H:%M:%S")),
            **want)
        size_kb = os.path.getsize(path) / 1024
        print(f"{name}: {len(want)} arrays, {size_kb:.0f} KB, "
              f"{time.time() - t0:.1f}s -> {path}")


if __name__ == "__main__":
    main()
