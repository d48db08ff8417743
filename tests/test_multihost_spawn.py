"""Multi-process DP over a real process boundary (tests/_mp_worker.py).

Round-3 verdict: parallel/multihost.py was arg-path-tested only — no test
had ever launched two coordinated processes, so the actual DCN-side path
(jax.distributed.initialize + a data axis across processes + per-host
token feeding) was extrapolation. This launches 2 CPU processes with 4
virtual devices each (gloo cross-process collectives), builds
pod_mesh(model=4) = tp=4 x dp=2-across-processes, and runs a psum over
the process-spanning axis, a tp_step with oracle parity, and a sampled
generation loop with per-host token feeding. SURVEY.md §2.3: DCN
stream-DP is new first-class scope (the reference is single-GPU)."""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_pod():
    """2 coordinated processes: bootstrap, pod mesh spanning both, DCN-side
    psum, tp_step oracle parity, per-host-fed sampled generation."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port)],
            env=_child_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MP_WORKER_OK {pid}" in out, out


def test_initialize_explicit_args_failure_exits_loudly():
    """A worker with explicit coordinator args pointing at a dead
    coordinator must FAIL (multihost.initialize raises), not silently
    serve single-process. Run as a subprocess so the bootstrap attempt is
    real (in-process the backend is already live)."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from rwkv_tpu.parallel.multihost import initialize;"
        "initialize(coordinator_address='127.0.0.1:1', num_processes=2,"
        " process_id=1, initialization_timeout=3)"
    )
    r = subprocess.run([sys.executable, "-c", code], env=_child_env(),
                       capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    # Two loud shapes, both acceptable: the bootstrap failure surfaces as
    # a Python exception (multihost.initialize re-raises with context), or
    # jax's coordination client abseil-FATALs the process before Python
    # sees it (observed on jax 0.9: "Terminating process because the JAX
    # distributed service detected fatal errors"). Either way the process
    # dies instead of serving single-process.
    out = r.stderr + r.stdout
    assert ("refusing to silently fall back" in out
            or "Terminating process" in out), out
