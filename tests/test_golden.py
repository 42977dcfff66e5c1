"""Golden regression fixtures: one f64 LSRK45 step of the tri-Euler and
hex-Euler configurations, stored in tests/golden/euler_one_step.npz
(SURVEY.md section 4 implication (e): a stored fixture catches silent
semantic drift that the property-based oracles cannot see; regenerate
deliberately with tests/golden/generate.py after an intended change)."""

import os

import jax
import numpy as np

from tests.golden.generate import cases

_PATH = os.path.join(os.path.dirname(__file__), "golden",
                     "euler_one_step.npz")


def test_golden_one_rk_step():
    stored = np.load(_PATH)
    fresh = cases()
    for key in stored.files:
        np.testing.assert_allclose(
            fresh[key], stored[key], rtol=1e-13, atol=1e-13,
            err_msg=f"golden mismatch: {key}",
        )
