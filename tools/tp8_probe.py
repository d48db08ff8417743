"""tp=8 fused-body execution probe — the 14B north-star TP width.

The fused in-kernel-RDMA body is CI-proven at tp=2 and tp=4
(tests/test_decode_stack_tp.py); tp=8 — the width the 14B BASELINE config
serves at — exercises 7-peer one-shot reduce-scatter/all-gather loops and
7 peer-slots of exchange VMEM that no smaller width reaches. Interpret-mode
cost grows superlinearly with tp (CLAUDE.md: tp=8/E=1024 > 15 min), so
this runs OFF-CI, once, and its result is recorded in BENCH_NOTES.md;
tests/test_decode_stack_tp.py carries the same case as
@pytest.mark.slow for on-demand reruns.

Minimum shapes satisfying the fused body's eligibility at tp=8:
E=1024 (E/tp=128 lane-aligned), L=1, B=2, vocab padded to 1024 (128*tp).
Race detector ON; parity vs the unsharded oracle; exactly-one-XLA-collective
pin (the logits gather — everything else is in-kernel RDMA).

Reference hot loop this must match per shard:
/root/reference/include/rwkv/cuda/rwkv.cu:493-593 (cuda_rwkv_parralel).
"""

import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# 16 devices for an 8-device mesh — deliberate. With exactly 8 CPU devices
# the 8 interpret-mode shard programs occupy every thread in the PJRT CPU
# client's execution pool (sized by device count on this 1-core box), and
# each program's _allocate_buffer io_callback then blocks in np.array(val)
# — a D2H that needs a free pool thread — deadlocking all 8 (verified by
# faulthandler: 8 threads parked in interpret_pallas_call._allocate_buffer).
# tp<=4 leaves spare threads, which is why CI never sees this. Doubling the
# device count doubles the pool; the mesh still uses devices [0:8].
jax.config.update("jax_num_cpu_devices", 16)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rwkv_tpu.models.config import RWKVConfig  # noqa: E402
from rwkv_tpu.models.rwkv4 import (  # noqa: E402
    forward_step,
    init_params,
    init_state,
    pad_vocab,
    quantize_params,
    signedize_params,
)
from rwkv_tpu.parallel.mesh import make_mesh  # noqa: E402
from rwkv_tpu.parallel.sharding import shard_params, shard_state  # noqa: E402
from rwkv_tpu.parallel.tp_step import make_tp_step  # noqa: E402


def main():
    t_start = time.perf_counter()
    cfg = RWKVConfig.tiny_test(n_layer=1, n_embd=1024, vocab_size=300)
    params = signedize_params(pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)),
        multiple=1024,   # 128 * tp: lane-aligned per-shard vocab
    ))
    mesh = make_mesh(model=8, data=1)
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)
    t_setup = time.perf_counter() - t_start
    print(f"[tp8] setup + oracle: {t_setup:.1f}s", flush=True)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))

    t0 = time.perf_counter()
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
        l_tp = np.asarray(l_tp)
        s_tp = [np.asarray(s) for s in s_tp]
    t_exec = time.perf_counter() - t0
    print(f"[tp8] fused step executed (interpret, detect_races): "
          f"{t_exec:.1f}s", flush=True)

    np.testing.assert_allclose(l_tp, np.asarray(l_ref), rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(a, np.asarray(b), rtol=3e-4, atol=3e-4)
    print("[tp8] parity vs oracle OK", flush=True)

    races_found = None
    try:
        from jax._src.pallas.mosaic.interpret import interpret_pallas_call
        races_found = bool(
            getattr(interpret_pallas_call.races, "races_found", False))
        assert not races_found, "race detector flagged the tp=8 exchange"
        print("[tp8] happens-before race detector quiet", flush=True)
    except ImportError:
        print("[tp8] race-detector flag not importable (skipped)", flush=True)

    # exactly ONE XLA collective (the logits all-gather); zero permutes
    import re

    t0 = time.perf_counter()
    with jax.sharding.set_mesh(mesh):
        hlo = step.lower(p_sh, tok, st_sh).compile().as_text()
    t_hlo = time.perf_counter() - t0
    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    assert counts.get("all-reduce", 0) == 0, counts
    assert counts.get("all-gather", 0) == 1, counts
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts
    assert counts.get("collective-permute", 0) == 0, counts
    print(f"[tp8] HLO collective pin OK ({t_hlo:.1f}s): {counts}", flush=True)

    result = {
        "probe": "tp8_fused_interpret",
        "tp": 8, "E": cfg.n_embd, "L": cfg.n_layer, "B": B,
        "e_loc": cfg.n_embd // 8,
        "detect_races": True, "races_found": races_found,
        "parity": "pass", "collectives": counts,
        "exec_s": round(t_exec, 1), "hlo_s": round(t_hlo, 1),
        "total_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(result), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "tp8_probe_result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
