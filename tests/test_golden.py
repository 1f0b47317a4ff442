"""Golden tests: frozen control trajectories for the five BASELINE configs
(SURVEY.md section 5 item 4). Regenerate ONLY deliberately with
``python tests/golden/generate.py``."""

import os

import numpy as np
import pytest

import golden.generate as gen

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.mark.parametrize("name,fn", gen.scenarios())
def test_golden(name, fn):
    path = os.path.join(HERE, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tests/golden/generate.py")
    want = np.load(path)
    got = {k: np.asarray(v) for k, v in fn().items()}
    for key in want.files:
        np.testing.assert_allclose(
            got[key], want[key], atol=1e-4, rtol=1e-4,
            err_msg=f"{name}:{key} drifted from golden — if intended, regenerate",
        )
