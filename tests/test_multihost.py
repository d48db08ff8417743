"""Multi-host helpers: pod_mesh axis arithmetic and initialize() argument
paths (single-process: jax.distributed bootstrap must no-op gracefully).

Reference has no analog (single GPU, SURVEY.md §2.3); multi-host DP over
DCN is new first-class scope. These tests pin the single-process behavior
of parallel/multihost.py — the code every host of a real pod runs."""

import jax
import pytest

from rwkv_tpu.parallel.multihost import initialize, pod_mesh


def test_pod_mesh_slice_default():
    """model='slice' spans the local devices with TP; no cross-host data
    axis in a single-process run (8 virtual devices -> 1 x 8)."""
    mesh = pod_mesh()
    assert mesh.shape["model"] == jax.local_device_count()
    assert mesh.shape["data"] == jax.device_count() // jax.local_device_count()
    assert mesh.axis_names == ("data", "model")


@pytest.mark.parametrize("tp", [1, 2, 4, 8])
def test_pod_mesh_explicit_tp(tp):
    mesh = pod_mesh(model=tp)
    assert mesh.shape["model"] == tp
    assert mesh.shape["data"] == jax.device_count() // tp


def test_pod_mesh_indivisible_tp_raises():
    with pytest.raises(ValueError, match="not divisible"):
        pod_mesh(model=3)


def test_initialize_single_process_noop():
    """Without a coordinator, initialize() must swallow the bootstrap
    failure (single-host run) and leave jax usable."""
    initialize()
    assert jax.process_count() == 1
    assert len(jax.devices()) >= 1


def test_initialize_explicit_args_failure_raises():
    """With EXPLICIT coordinator args a failed bootstrap must raise —
    never silently degrade to single-process serving (round-3 verdict:
    a misconfigured pod coordinator must be loud). In this process the
    backend is already live, so the bootstrap reliably fails."""
    with pytest.raises(RuntimeError, match="refusing to silently fall"):
        initialize(coordinator_address="127.0.0.1:65432",
                   num_processes=1, process_id=0)
    assert jax.process_count() == 1  # untouched
