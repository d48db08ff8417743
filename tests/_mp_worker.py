"""One process of a 2-process DCN-spanning pod simulation.

Launched by tests/test_multihost_spawn.py: two coordinated CPU processes
(4 virtual devices each) bootstrap jax.distributed through
rwkv_tpu.parallel.multihost.initialize, build pod_mesh(model=4)
= tp=4 within each process x dp=2 ACROSS the process boundary, and run

  1. a cross-process psum over the 'data' axis (the DCN-side collective),
  2. one tp_step decode over the pod mesh with per-host state/params
     (parity vs the unsharded oracle on this host's streams),
  3. a 3-token sampled generation loop with PER-HOST token feeding
     (each host samples its own streams and re-feeds them as the global
     [B] batch via multihost_utils), and
  4. a process_allgather checksum agreement check.

Usage: python _mp_worker.py <process_id> <coordinator_port>
Not collected by pytest (leading underscore). The reference has no analog
(single GPU, SURVEY.md §2.3); this pins the actual multi-process code
path — jax.distributed bootstrap + a data axis spanning processes — that
parallel/multihost.py exists for.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# CPU cross-process collectives ride gloo (the CPU stand-in for DCN)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

PID = int(sys.argv[1])
PORT = sys.argv[2]

from rwkv_tpu.parallel.multihost import initialize, pod_mesh  # noqa: E402

initialize(coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
           process_id=PID, initialization_timeout=60)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 8

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils as mhu  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from rwkv_tpu.models.config import RWKVConfig  # noqa: E402
from rwkv_tpu.models.rwkv4 import (  # noqa: E402
    forward_step,
    init_params,
    init_state,
    pad_vocab,
    quantize_params,
    signedize_params,
)
from rwkv_tpu.ops.sampling import typical  # noqa: E402
from rwkv_tpu.parallel.sharding import param_pspecs, state_pspecs  # noqa: E402
from rwkv_tpu.parallel.tp_step import make_tp_step  # noqa: E402

mesh = pod_mesh(model=4)  # data axis = 2, spanning the two processes
assert dict(mesh.shape) == {"data": 2, "model": 4}, mesh.shape

# ---- 1. DCN-side collective: psum over the process-spanning axis --------
local = np.full((2,), float(PID + 1), np.float32)
glob = mhu.host_local_array_to_global_array(local, mesh, P("data"))
sm = jax.shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                   in_specs=P("data"), out_specs=P())
res = mhu.global_array_to_host_local_array(jax.jit(sm)(glob), mesh, P())
assert np.allclose(np.asarray(res), 3.0), res  # 1 + 2 across processes
print(f"[{PID}] cross-process psum over data OK", flush=True)

# ---- 2. pod-mesh tp_step vs the unsharded oracle ------------------------
cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=256, vocab_size=300)
params = signedize_params(pad_vocab(
    quantize_params(init_params(jax.random.PRNGKey(0), cfg)),
    multiple=512,
))
B_loc, B = 2, 4
tok_all = np.asarray([3, 150, 7, 299], np.int32)
state_all = init_state(cfg, (B,))
l_ref, s_ref = forward_step(params, jnp.asarray(tok_all), state_all)
l_ref = np.asarray(l_ref)

pspecs = param_pspecs(params, n_model=4)
params_g = jax.tree.map(
    lambda x, s: mhu.host_local_array_to_global_array(np.asarray(x), mesh, s),
    params, pspecs)
sspecs = state_pspecs(batched=True)
state_g = jax.tree.map(
    lambda x, s: mhu.host_local_array_to_global_array(
        np.asarray(x)[:, PID * B_loc:(PID + 1) * B_loc], mesh, s),
    init_state(cfg, (B,)), sspecs)
tok_loc = tok_all[PID * B_loc:(PID + 1) * B_loc]
tok_g = mhu.host_local_array_to_global_array(tok_loc, mesh, P("data"))

step = make_tp_step(mesh, params, body="xla")
with jax.sharding.set_mesh(mesh):
    l_g, s_g = step(params_g, tok_g, state_g)
l_loc = np.asarray(
    mhu.global_array_to_host_local_array(l_g, mesh, P("data", None)))
np.testing.assert_allclose(l_loc, l_ref[PID * B_loc:(PID + 1) * B_loc],
                           rtol=3e-4, atol=3e-4)
print(f"[{PID}] pod tp_step parity vs oracle OK (my streams "
      f"{PID * B_loc}..{PID * B_loc + B_loc - 1})", flush=True)

# ---- 3. sampled generation with per-host token feeding ------------------
keys = [jax.random.PRNGKey(1000 * PID + i) for i in range(B_loc)]
logits_loc = l_loc
trace = []
for t in range(3):
    nxt = []
    for i in range(B_loc):
        keys[i], sub = jax.random.split(keys[i])
        nxt.append(int(typical(sub, jnp.asarray(logits_loc[i]),
                               temp=0.9, tau=0.8)))
    trace.append(nxt)
    tok_g = mhu.host_local_array_to_global_array(
        np.asarray(nxt, np.int32), mesh, P("data"))
    with jax.sharding.set_mesh(mesh):
        l_g, s_g = step(params_g, tok_g, s_g)
    logits_loc = np.asarray(
        mhu.global_array_to_host_local_array(l_g, mesh, P("data", None)))
assert np.isfinite(logits_loc).all()
print(f"[{PID}] 3-step per-host-fed generation OK: {trace}", flush=True)

# ---- 4. cross-process agreement: both hosts alive with matched sums -----
checksum = np.float32(np.abs(logits_loc).sum())
gathered = np.asarray(mhu.process_allgather(checksum))
assert gathered.shape[0] == 2 and np.isfinite(gathered).all(), gathered
print(f"[{PID}] checksum allgather OK: {gathered}", flush=True)
print(f"MP_WORKER_OK {PID}", flush=True)
