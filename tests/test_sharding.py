"""Tensor/data parallelism on the 8-device virtual CPU mesh: sharded
execution must be numerically identical to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_seq,
    forward_step,
    init_params,
    init_state,
    quantize_params,
)
from rwkv_tpu.parallel.mesh import make_mesh
from rwkv_tpu.parallel.sharding import (
    make_put,
    param_pspecs,
    shard_params,
    shard_state,
    state_pspecs,
)


@pytest.fixture(scope="module")
def model():
    # E=128 so E and 4E divide the 4-way model axis cleanly
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=128, vocab_size=257)
    params = quantize_params(init_params(jax.random.PRNGKey(9), cfg))
    return cfg, params


def test_mesh_shapes():
    m = make_mesh(model=4, data=2)
    assert m.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(model=16, data=2)


def test_pspec_tree_structure_matches(model):
    cfg, params = model
    specs = param_pspecs(params)
    # must be zippable leaf-for-leaf
    jax.tree.map(lambda a, b: None, params, specs)


def test_tp_step_matches_single_device(model):
    cfg, params = model
    mesh = make_mesh(model=4, data=1)

    state0 = init_state(cfg)
    tok = jnp.asarray(42)
    l_ref, s_ref = jax.jit(forward_step)(params, tok, state0)

    p_sh = shard_params(params, mesh)
    s_sh = shard_state(state0, mesh, batched=False)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(forward_step)(p_sh, tok, s_sh)

    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref), rtol=2e-4, atol=2e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_tp_dp_batched_decode(model):
    """Full 2x4 mesh: 4 streams DP-sharded x TP-sharded weights."""
    cfg, params = model
    mesh = make_mesh(model=4, data=2)
    B = 4

    state0 = init_state(cfg, (B,))
    toks = jnp.asarray([1, 2, 3, 4])
    l_ref, s_ref = jax.jit(forward_step)(params, toks, state0)

    p_sh = shard_params(params, mesh)
    s_sh = shard_state(state0, mesh, batched=True)
    toks_sh = jax.device_put(toks, NamedSharding(mesh, P("data")))
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(forward_step)(p_sh, toks_sh, s_sh)

    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref), rtol=2e-4, atol=2e-4)


def test_tp_prefill_matches(model):
    cfg, params = model
    mesh = make_mesh(model=8, data=1)
    tokens = jnp.asarray(np.arange(13) % cfg.vocab_size)

    state0 = init_state(cfg)
    l_ref, s_ref = forward_seq(params, tokens, state0, parallel=True)

    p_sh = shard_params(params, mesh)
    s_sh = shard_state(state0, mesh, batched=False)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(
            lambda p, t, s: forward_seq(p, t, s, parallel=True)
        )(p_sh, tokens, s_sh)

    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref), rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_padded_vocab_fully_sharded(model):
    """pad_vocab makes emb/head TP-shardable; logits for padded ids -1e9."""
    from rwkv_tpu.models.rwkv4 import pad_vocab

    cfg, params = model
    padded = pad_vocab(params, multiple=128)  # 257 -> 384
    assert padded.emb.shape[0] == 384

    mesh = make_mesh(model=4, data=1)
    p_sh = shard_params(padded, mesh)
    assert p_sh.emb.sharding.spec == P("model", None)
    assert p_sh.head.w.sharding.spec == P(None, "model")

    s = init_state(cfg)
    l_ref, _ = forward_step(params, jnp.asarray(7), s)
    with jax.sharding.set_mesh(mesh):
        l_pad, _ = jax.jit(forward_step)(
            p_sh, jnp.asarray(7), shard_state(s, mesh, batched=False)
        )
    l_pad = np.asarray(l_pad)
    np.testing.assert_allclose(l_pad[:257], np.asarray(l_ref), rtol=2e-4, atol=2e-4)
    assert (l_pad[257:] < -1e8).all()


def test_sharded_streaming_load(tmp_path):
    """read_bin with the TP `put` lands weights pre-sharded."""
    from rwkv_tpu.io.binfmt import read_bin, write_bin

    cfg = RWKVConfig(n_layer=2, n_embd=16)
    params = quantize_params(init_params(jax.random.PRNGKey(2), cfg))
    path = str(tmp_path / "m.bin")
    write_bin(path, params)

    mesh = make_mesh(model=4, data=2)
    loaded = read_bin(path, put=make_put(mesh))
    km_sharding = loaded.att.key.w.sharding
    assert km_sharding.spec == P(None, None, "model")
    l0, _ = forward_step(params, jnp.asarray(3), init_state(cfg))
    with jax.sharding.set_mesh(mesh):
        l1, _ = jax.jit(forward_step)(
            loaded, jnp.asarray(3), shard_state(init_state(cfg), mesh, batched=False)
        )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=2e-4, atol=2e-4)


def test_pod_mesh_virtual_devices():
    """pod_mesh over the 8 virtual CPU devices: model='slice' puts TP on
    the local devices, explicit ints split TP x DP."""
    from rwkv_tpu.parallel.multihost import pod_mesh

    mesh = pod_mesh()  # model="slice": all 8 local
    assert mesh.shape["model"] * mesh.shape["data"] == 8
    mesh2 = pod_mesh(model=4)
    assert mesh2.shape["model"] == 4 and mesh2.shape["data"] == 2


def test_sharded_step_collective_count_pinned():
    """Pin the compiled communication pattern of the TP decode step: 2
    activation psums per block by design, plus the scalar quant-offset
    reductions and head gathers GSPMD currently emits. A regression that
    silently multiplies collectives would wreck multi-chip latency (see
    docs/SCALING.md) — this test makes it loud."""
    import re

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rwkv_tpu.models.rwkv4 import (forward_step, init_params, init_state,
                                       pad_vocab, quantize_params)
    from rwkv_tpu.parallel.mesh import make_mesh
    from rwkv_tpu.parallel.sharding import shard_params, shard_state

    mesh = make_mesh(model=4, data=2)
    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=128, vocab_size=211)
    params = pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)), multiple=512
    )
    p = shard_params(params, mesh)
    st = shard_state(init_state(cfg, (2,)), mesh, batched=True)
    tok = jax.device_put(jnp.asarray([3, 5], jnp.int32),
                         NamedSharding(mesh, P("data")))
    with jax.sharding.set_mesh(mesh):
        hlo = jax.jit(forward_step).lower(p, tok, st).compile().as_text()

    counts = {}
    pat = r"= \S*\s*(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)(?:-start)?\("
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    L = cfg.n_layer
    # compiled today: ~11 AR (2L psums + scalar offset partials) + 7 AG + 1 CP
    assert counts.get("all-reduce", 0) <= 4 * L + 4, counts
    assert counts.get("all-gather", 0) <= 2 * L + 4, counts
    assert counts.get("all-to-all", 0) + counts.get("reduce-scatter", 0) <= 2, counts


def test_shard_state_tp1_drops_model_axis(model):
    """shard_state on a model=1 mesh must emit 'model'-free specs, like
    state_pspecs(n_model=1): the tp=1 collective-elided bodies reject
    model-varying state types under check_vma (tp_step.py tp=1 rule)."""
    cfg, _ = model
    mesh = make_mesh(model=1, data=2)
    st = shard_state(init_state(cfg, (2,)), mesh, batched=True)
    for leaf in jax.tree.leaves(st):
        for ax in leaf.sharding.spec:
            axes = ax if isinstance(ax, tuple) else (ax,)
            assert "model" not in axes, leaf.sharding.spec


def test_dryrun_multichip_raises_on_too_few_devices():
    """__graft_entry__.dryrun_multichip forces the CPU platform itself when
    the backend is uninitialized; once a backend exists (as in this suite)
    it must fail LOUDLY, not fall through to a confusing mesh error, when
    the device count can no longer be satisfied."""
    import __graft_entry__ as g

    assert len(jax.devices()) == 8  # backend initialized by the suite
    with pytest.raises(RuntimeError, match="needs 16 devices"):
        g.dryrun_multichip(16)
