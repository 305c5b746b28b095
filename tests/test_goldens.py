"""Reference-free numerical parity against the frozen goldens.

These tests assert the same parity contracts as ``tests/test_parity_*.py``
but against the committed ``tests/goldens/*.npz`` fixtures instead of the
live reference checkout — so the parity guarantee holds even when
``/root/reference`` is absent (VERDICT round-4 mandate #6: "pytest with the
reference checkout renamed away still asserts numerical parity").

Each scenario regenerates its inputs deterministically from our simulator and
first asserts the SHA-256 recorded at golden-generation time still matches —
simulator/config drift fails loudly with a regeneration hint instead of as a
confusing numeric mismatch.  Regenerate with ``python scripts/make_goldens.py``
(requires the live reference).
"""

import os

import numpy as np
import pytest

from tests.golden_scenarios import GOLDEN_DIR, SCENARIOS, input_sha


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"golden fixture {name}.npz missing — run scripts/make_goldens.py "
        "with the live reference checkout")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_golden_parity(name):
    sc = SCENARIOS[name]
    golden = _load(name)
    inputs = sc.make_inputs()
    sha = input_sha(inputs)
    want_sha = str(golden.pop("meta_input_sha"))
    golden.pop("meta_generated_at", None)
    assert sha == want_sha, (
        f"{name}: regenerated inputs differ from what the golden was made "
        "from (simulator/config drift) — re-run scripts/make_goldens.py and "
        "review the diff")
    got = sc.run_ours(inputs)
    sc.compare(got, golden)
