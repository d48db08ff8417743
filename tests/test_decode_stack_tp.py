"""Fused TP decode kernel (in-kernel RDMA collectives) vs the oracle.

tp=1 runs the kernel's plain compute path; tp>1 runs under shard_map with
Pallas's TPU interpret mode simulating the inter-chip DMAs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_step,
    init_params,
    init_state,
    pad_vocab,
    quantize_params,
    signedize_params,
)
from rwkv_tpu.ops.layernorm import layer_norm
from rwkv_tpu.ops.pallas.decode_stack_tp import decode_stack_tp
from rwkv_tpu.parallel.mesh import make_mesh
from rwkv_tpu.parallel.sharding import shard_params, shard_state
from rwkv_tpu.parallel.tp_step import make_tp_step


def _assert_one_collective(step, *args):
    """The fused body must compile to exactly ONE XLA collective per token
    (the logits all-gather) — every other exchange is in-kernel RDMA."""
    import re

    hlo = step.lower(*args).compile().as_text()
    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    assert counts.get("all-reduce", 0) == 0, counts
    assert counts.get("all-gather", 0) == 1, counts   # logits gather
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts
    assert counts.get("collective-permute", 0) == 0, counts


def _assert_no_races():
    try:  # internal flag; absence just skips the extra assertion
        from jax._src.pallas.mosaic.interpret import interpret_pallas_call
        assert not getattr(interpret_pallas_call.races, "races_found", False)
    except ImportError:
        pass


@pytest.fixture(scope="module")
def model():
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=256, vocab_size=300)
    params = signedize_params(pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)),
        multiple=256,
    ))
    return cfg, params


def test_tp1_matches_oracle(model):
    cfg, params = model
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([5, 9], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    x = params.emb[tok].astype(jnp.float32)
    x = layer_norm(x, params.ln0.weight, params.ln0.bias)
    logits_loc, s_tp = decode_stack_tp(
        x, params, state, params.att.decay, params.att.bonus,
        tp=1, tile=128, interpret=True, data_axis=None,
    )
    logits = logits_loc + params.logit_bias
    np.testing.assert_allclose(np.asarray(logits), np.asarray(l_ref),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_tp1_state_carry(model):
    """Multi-step decode through the fused TP kernel tracks the oracle."""
    cfg, params = model
    s_r = s_f = init_state(cfg, (1,))
    for t in (3, 1, 9, 100):
        tok = jnp.asarray([t], jnp.int32)
        l_r, s_r = forward_step(params, tok, s_r)
        x = layer_norm(params.emb[tok].astype(jnp.float32),
                       params.ln0.weight, params.ln0.bias)
        lg, s_f = decode_stack_tp(
            x, params, s_f, params.att.decay, params.att.bonus,
            tp=1, tile=128, interpret=True, data_axis=None,
        )
    np.testing.assert_allclose(np.asarray(lg + params.logit_bias),
                               np.asarray(l_r), rtol=3e-4, atol=3e-4)


def test_tp2_shard_map_rdma_parity(model):
    """tp=2 under shard_map: the in-kernel collectives (simulated RDMAs)
    must reproduce the unsharded step exactly — and the happens-before
    race detector must stay quiet (validates the cross-layer buffer-reuse
    ordering argument: each exchange's sends transitively require every
    peer to have consumed the previous layer's buffers)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, params = model
    mesh = make_mesh(model=2, data=1)
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    _assert_no_races()


def test_tp4_multi_peer_rdma_parity():
    """tp=4: the >=3-peer reduce-scatter/all-gather loops and semaphore
    waits (decode_stack_tp._red_start/_red_finish, off in 1..3) — exactly
    the modular arithmetic that can work at 2 peers and misroute or
    deadlock at 4. E=512 so E/tp=128 (lane-aligned); race detector on.
    Runs in ~6 s (interpret-mode RDMA simulation; keep shapes minimal)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = RWKVConfig.tiny_test(n_layer=1, n_embd=512, vocab_size=300)
    params = signedize_params(pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)),
        multiple=512,
    ))
    mesh = make_mesh(model=4, data=1)
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    _assert_no_races()
    _assert_one_collective(step, p_sh, tok, st_sh)


def test_tp2_data2_peer_base_offset(model):
    """tp=2 x data=2: every RDMA's device_id must stay inside the sender's
    OWN data row — `base = axis_index('data') * tp`
    (decode_stack_tp.py:128-135) had never executed before this test.
    Distinct token streams per data shard make any cross-row misroute a
    parity failure, not a silent aliasing."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, params = model
    mesh = make_mesh(model=2, data=2)
    B = 4                      # 2 streams per data shard
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150, 7, 299], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    _assert_no_races()
    _assert_one_collective(step, p_sh, tok, st_sh)


def test_fused_body_xla_collective_count(model):
    """With the collectives (including the embedding reduce) inside the
    kernel, the compiled program contains exactly ONE XLA collective per
    token — the logits gather — independent of depth."""
    import re

    cfg, params = model
    mesh = make_mesh(model=2, data=1)
    state = init_state(cfg, (2,))
    tok = jnp.asarray([3, 150], jnp.int32)
    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused", interpret=True)
    with jax.sharding.set_mesh(mesh):
        hlo = step.lower(p_sh, tok, st_sh).compile().as_text()
    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    assert counts.get("all-reduce", 0) == 0, counts
    assert counts.get("all-gather", 0) == 1, counts   # logits gather
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts
    assert counts.get("collective-permute", 0) == 0, counts


def test_pick_tp_head_tile_alignment():
    """Head tiles must be 128-multiple DIVISORS of the local vocab shard;
    a misaligned shard (e.g. 50688/8 = 6336) must fail loudly here rather
    than as a real-chip Mosaic lowering error."""
    from rwkv_tpu.ops.pallas.decode_stack_tp import pick_tp_head_tile

    with pytest.raises(ValueError):
        pick_tp_head_tile(2048, 128, 6336, e_loc=256, tp=8)
    for v_loc in (6400, 12672, 50688, 25344):
        ht = pick_tp_head_tile(1024, 256, v_loc, e_loc=256, tp=4)
        assert v_loc % ht == 0 and ht % 128 == 0, (v_loc, ht)


def test_engine_repads_for_per_shard_alignment():
    """A 512-padded vocab (50688) at tp=8 has a misaligned 6336-wide
    shard; the sharded engine must repad so Vp % (128*tp) == 0."""
    from rwkv_tpu.models.rwkv4 import init_params, quantize_params
    from rwkv_tpu.parallel.sharding import ShardingContext
    from rwkv_tpu.runtime.engine import RWKV

    cfg = RWKVConfig(n_layer=1, n_embd=128)  # vocab 50277
    params = pad_vocab(quantize_params(init_params(jax.random.PRNGKey(3), cfg)),
                       multiple=512)          # 50688: % (128*8) != 0
    mesh = make_mesh(model=8, data=1)
    with jax.sharding.set_mesh(mesh):
        eng = RWKV(sharding=ShardingContext(mesh))
        eng.load_params(params)
    Vp = eng.params.head.w.shape[-1]
    assert Vp % (128 * 8) == 0, Vp
    assert eng._true_vocab == 50277


def test_tp2_pretiled_parity(model):
    """Pretiled (contiguous-block) weights shard on the block dim and run
    through the fused TP kernel (auto-selected for the 4-D layout)."""
    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg, params = model
    pt = pretile_params(params, tile=128)
    mesh = make_mesh(model=2, data=1)
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([5, 9], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)
    p_sh = shard_params(pt, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, pt, interpret=True)   # auto: 4-D -> fused
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_tp2_large_batch_embed_fallback(model):
    """B > 8 under TP: fuse_embed is capped at 8, so the step must fall
    back to the XLA embed psum and feed the kernel a replicated [B, E]
    x_in — the pool-sized sharded regime. This x_in-at-tp>1 path had
    never executed (all other tp>1 tests ride the in-kernel gather)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, params = model
    mesh = make_mesh(model=2, data=1)
    B = 10
    state = init_state(cfg, (B,))
    tok = jnp.asarray(np.arange(B) * 29 % 300, jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    _assert_no_races()


def test_pick_tp_fused_tile_scales_with_batch():
    """The f32 activation scratch scales with the padded batch, so the
    tile picker must shrink the tile as bp grows (a bp=8 tile at B=128
    would OOM VMEM on hardware)."""
    from rwkv_tpu.ops.pallas.decode_stack_tp import pick_tp_fused_tile

    # e_loc > 768: NOT full-width (measured 23% slower at E=1024) — 512
    # until the batch-scaled scratch forces 256
    t8 = pick_tp_fused_tile(1024, 1024, 1, bp=8)
    t32 = pick_tp_fused_tile(1024, 1024, 1, bp=32)
    t128 = pick_tp_fused_tile(1024, 1024, 1, bp=128)
    assert t8 == 512 and t32 == 512 and t128 == 256, (t8, t32, t128)
    # small e_loc keeps the measured full-width win (169M regime)
    assert pick_tp_fused_tile(768, 768, 1, bp=8) == 768
    with pytest.raises(ValueError):                    # scratch alone > VMEM
        pick_tp_fused_tile(1024, 1024, 1, bp=256)


def test_pretiled_vmem_check_uses_actual_batch(model):
    """A baked-in tile that fits at B=8 but not at a huge batch must be
    rejected by decode_stack_tp's pre-check (ValueError), not surface as
    a Mosaic OOM on hardware."""
    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg, params = model
    pt = pretile_params(params, tile=256)   # full-width at E=256
    B = 1024                                # bp scratch >> 15MB budget
    state = init_state(cfg, (B,))
    tok = jnp.zeros((B,), jnp.int32)
    x = jnp.zeros((B, cfg.n_embd), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        decode_stack_tp(
            x, pt, state, params.att.decay, params.att.bonus,
            tp=1, interpret=True, data_axis=None,
        )


def test_make_put_pretiled_block_dim_spec():
    """read_bin(pretile=...) hands make_put 4-D [L, O/t, E, t] arrays for
    the five column families: they must shard on the BLOCK dim (the same
    output-column partition as the 3-D column spec)."""
    from jax.sharding import PartitionSpec as P

    from rwkv_tpu.parallel.sharding import make_put

    mesh = make_mesh(model=2, data=1)
    put = make_put(mesh)
    w4 = np.zeros((2, 4, 64, 32), np.int8)    # [L, O/t, E, t]
    for name in ("km", "vm", "rm", "ffn_k", "ffn_r"):
        arr = put(name, w4)
        assert arr.sharding.spec == P(None, "model", None, None), name
    # row-parallel families stay 3-D with their row spec
    arr = put("att_out", np.zeros((2, 64, 64), np.int8))
    assert arr.sharding.spec == P(None, "model", None)


def test_pick_tp_fused_tile_model_size_pins():
    """Pin the auto-picked tile for every standard config at tp=1/B=1 —
    the perf surface the benches stand on. The measured optimum keeps
    E*tile ~ 512KB per weight block (BENCH_NOTES round 3): full-width at
    169M, then 512/256/256/128/128 as E grows."""
    from rwkv_tpu.ops.pallas.decode_stack_tp import pick_tp_fused_tile

    expect = {768: 768, 1024: 512, 2048: 256, 2560: 256,
              4096: 128, 5120: 128}
    for e, want in expect.items():
        got = pick_tp_fused_tile(e, e, 1, bp=8)
        assert got == want, (e, got, want)
    # pod shapes: per-shard e_loc with the tp exchange scratch — every
    # pick lands on the same E*tile ~ 512KB plateau
    assert pick_tp_fused_tile(1024, 512, 2, bp=8) == 512    # 430M tp=2
    assert pick_tp_fused_tile(4096, 1024, 4, bp=8) == 128   # 7B tp=4
    assert pick_tp_fused_tile(5120, 640, 8, bp=8) == 128    # 14B tp=8


def test_tp4_pretiled_parity():
    """Pretiled (contiguous-block) weights at tp=4 — the layout the
    engine serves batches with, on a production TP width: block-dim
    sharding must partition output columns identically to the 3-D column
    shard through the multi-peer RDMA reduce."""
    from jax.experimental.pallas import tpu as pltpu

    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg = RWKVConfig.tiny_test(n_layer=1, n_embd=512, vocab_size=300)
    params = signedize_params(pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)),
        multiple=512,
    ))
    pt = pretile_params(params, tile=128)   # E/tp = 128 per shard
    mesh = make_mesh(model=4, data=1)
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(pt, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, pt, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    _assert_no_races()


@pytest.mark.slow
def test_tp8_fused_probe_subprocess():
    """tp=8 — the 14B north-star width: 7-peer one-shot RDMA loops that no
    smaller tp reaches. Runs tools/tp8_probe.py in a SUBPROCESS because the
    probe needs 16 CPU devices (device count is fixed at backend init;
    conftest pins this process to 8): with exactly 8, the 8 interpret-mode
    shard programs exhaust the PJRT CPU client's execution pool and their
    _allocate_buffer D2H callbacks deadlock — see the probe's header.
    Recorded run (2026-08-17): exec 19.2 s, parity pass, race detector
    quiet, exactly one all-gather, zero permutes (tp8_probe_result.json)."""
    import json
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(root / "tools" / "tp8_probe.py")],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.loads((root / "tp8_probe_result.json").read_text())
    assert result["parity"] == "pass"
    assert result["races_found"] is False
    assert result["collectives"] == {"all-gather": 1}


@pytest.fixture(scope="module")
def model_q4():
    from rwkv_tpu.models.rwkv4 import quantize_params_q4

    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=256, vocab_size=300)
    # tile=128 = E/tp at tp=2 (the TP kernel tile must divide E_loc)
    params = pad_vocab(
        quantize_params_q4(init_params(jax.random.PRNGKey(0), cfg),
                           tile=128),
        multiple=256,
    )
    return cfg, params


def test_q4_tp2_fused_parity(model_q4):
    """4-bit weights through the in-kernel-RDMA TP body at tp=2: packed
    blocks stream at half the bytes, _dot4/_fold4 run per shard, and the
    exchanges are unchanged f32 partials. Race detector on; exactly one
    XLA collective (the logits gather)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, params = model_q4
    mesh = make_mesh(model=2, data=1)
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="fused",
                        interpret=pltpu.InterpretParams(detect_races=True))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    _assert_no_races()
    _assert_one_collective(step, p_sh, tok, st_sh)


def test_q4_tp_body_guards(model_q4):
    """q4 params only run the fused body; xla/pallas bodies reject."""
    cfg, params = model_q4
    mesh = make_mesh(model=2, data=1)
    with pytest.raises(ValueError, match="fused"):
        make_tp_step(mesh, params, body="xla")
    with pytest.raises(ValueError, match="fused"):
        make_tp_step(mesh, params, body="pallas")


def test_q4_tp_prefill_parity(model_q4):
    """Sharded q4 prefill (XLA q4matmul per shard, minimal collective
    schedule) matches the unsharded oracle."""
    from rwkv_tpu.models.rwkv4 import forward_seq
    from rwkv_tpu.parallel.tp_step import make_engine_prefill

    cfg, params = model_q4
    mesh = make_mesh(model=2, data=1)
    toks = jnp.asarray([5, 77, 299, 1, 8], jnp.int32)
    state = init_state(cfg)
    l_ref, s_ref = forward_seq(params, toks, state)

    p_sh = shard_params(params, mesh)
    prefill = make_engine_prefill(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = prefill(p_sh, toks, state,
                             jnp.asarray(len(toks), jnp.int32))
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
