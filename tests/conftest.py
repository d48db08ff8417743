"""Test harness config: run everything on local CPU with 8 virtual devices.

Caveat discovered the hard way: a pytest plugin (jaxtyping) imports jax at
pytest startup — *before* conftest — so env vars alone are too late and the
suite would silently run against the session's remote TPU backend over a slow
tunnel. `jax.config.update` still works after import (backends initialize
lazily), so we set both the env and the config explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a session-scoped generator makes every
    # test's data depend on how many draws ran before it, so adding a
    # test anywhere can flip a tight tolerance elsewhere in the suite
    # (test_wkv.py::test_step_composes_to_scan flaked exactly this way).
    return np.random.default_rng(0)
