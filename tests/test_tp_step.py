"""Manual shard_map TP step: parity with the unsharded model and a pinned,
Megatron-minimal collective count (docs/SCALING.md)."""

import re

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
)
from rwkv_tpu.parallel.mesh import make_mesh
from rwkv_tpu.parallel.sharding import shard_params, shard_state
from rwkv_tpu.parallel.tp_step import make_tp_step


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(model=4, data=2)
    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=128, vocab_size=211)
    params = pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)), multiple=512
    )
    return mesh, cfg, params


def test_tp_step_matches_unsharded(setup):
    mesh, cfg, params = setup
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)

    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_tp_step_collective_count_minimal(setup):
    """Exactly 2 psums + 1 gather per block, +1 psum (embed) +1 gather
    (logits) per token — ~3x fewer collectives than the GSPMD path."""
    mesh, cfg, params = setup
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params)
    with jax.sharding.set_mesh(mesh):
        hlo = step.lower(p_sh, tok, st_sh).compile().as_text()

    counts = {}
    # matches sync and async forms, incl. tuple-shaped "(f32[..], ..)
    # all-reduce-start(" ops
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    # EXACT pin (scan rolls the 2 psums / 1 gather per block into one HLO
    # op each): 2 in-scan psums + 1 embed psum; 1 in-scan gather + 1
    # logits gather. -done/apply ops would inflate these; equality keeps
    # the test honest against both regressions and vacuous matches.
    assert counts.get("all-reduce", 0) == 3, counts
    assert counts.get("all-gather", 0) == 2, counts
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts


def test_tp_step_requires_padded_vocab(setup):
    mesh, cfg, _ = setup
    raw = quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    with pytest.raises(ValueError):
        make_tp_step(mesh, raw)


def test_tp_step_rejects_dense_params(setup):
    mesh, cfg, _ = setup
    dense = pad_vocab(init_params(jax.random.PRNGKey(0), cfg), multiple=512)
    with pytest.raises(TypeError):
        make_tp_step(mesh, dense)


# ---------------------------------------------------------------------------
# Pallas per-shard body (ops/pallas/tp_halves.py): the serving TP step.
# Needs E/tp lane-aligned (>= 128), so a wider fixture.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_pallas():
    from rwkv_tpu.models.rwkv4 import signedize_params

    mesh = make_mesh(model=4, data=2)
    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=512, vocab_size=211)
    params = signedize_params(pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(1), cfg)), multiple=512
    ))
    return mesh, cfg, params


def test_tp_step_pallas_matches_unsharded(setup_pallas):
    mesh, cfg, params = setup_pallas
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)

    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="pallas", interpret=True)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_tp_step_pallas_collective_count_minimal(setup_pallas):
    """The Pallas body keeps the EXACT same minimal collective schedule as
    the XLA body: 2 psums + 1 gather per block (+1 embed psum, +1 logits
    gather) — kernel fusion must not change the communication pattern."""
    mesh, cfg, params = setup_pallas
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params, body="pallas", interpret=True)
    with jax.sharding.set_mesh(mesh):
        hlo = step.lower(p_sh, tok, st_sh).compile().as_text()

    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    assert counts.get("all-reduce", 0) == 3, counts
    assert counts.get("all-gather", 0) == 2, counts
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts


def test_tp_step_auto_body_selection(setup_pallas):
    """body=None picks pallas when E/tp is lane-aligned, xla otherwise;
    requesting pallas on an ineligible model raises."""
    mesh, cfg, params = setup_pallas
    # E=512, tp=4 -> E/tp=128: eligible (builds without error)
    make_tp_step(mesh, params, interpret=True)
    # E=128, tp=4 -> E/tp=32: must fall back, and explicit pallas raises
    cfg2 = RWKVConfig.tiny_test(n_layer=2, n_embd=128, vocab_size=211)
    from rwkv_tpu.models.rwkv4 import signedize_params

    p2 = signedize_params(pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(2), cfg2)),
        multiple=512,
    ))
    make_tp_step(mesh, p2)  # auto -> xla, fine
    with pytest.raises(ValueError):
        make_tp_step(mesh, p2, body="pallas")


def test_engine_step_adapter(setup_pallas):
    """make_engine_step: scalar-token/unbatched-state and non-data-divisible
    batches round-trip through the padded shard_map call."""
    from rwkv_tpu.parallel.tp_step import make_engine_step

    mesh, cfg, params = setup_pallas
    p_sh = shard_params(params, mesh)
    step = make_engine_step(mesh, params, body="pallas", interpret=True)

    # unbatched
    state = init_state(cfg)
    l_ref, s_ref = forward_step(params, jnp.asarray(7, jnp.int32), state)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(step)(p_sh, jnp.asarray(7, jnp.int32), state)
    assert l_tp.shape == l_ref.shape
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)

    # B=3 not divisible by data=2
    state = init_state(cfg, (3,))
    tok = jnp.asarray([3, 150, 9], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(step)(p_sh, tok, state)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# TP prefill (batched ragged, parallel WKV scan, minimal collectives)
# ---------------------------------------------------------------------------


def test_tp_prefill_matches_unsharded(setup):
    from rwkv_tpu.models.rwkv4 import forward_seq
    from rwkv_tpu.parallel.tp_step import make_tp_prefill

    mesh, cfg, params = setup
    T, B = 12, 2
    toks = jnp.asarray(
        np.arange(T * B).reshape(T, B) % cfg.vocab_size, jnp.int32)
    lens = jnp.asarray([T, T - 3], jnp.int32)   # ragged
    state = init_state(cfg, (B,))
    l_ref, s_ref = forward_seq(params, toks, state, parallel=True,
                               length=lens)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    pre = make_tp_prefill(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = pre(p_sh, toks, st_sh, lens)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=5e-4, atol=5e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_tp_prefill_collective_count(setup):
    """Prefill keeps the decode schedule: exactly 2 psums + 1 gather per
    block, +1 embed psum +1 logits gather — amortized over all T tokens
    (the GSPMD prefill compiles ~8 collectives per block)."""
    from rwkv_tpu.parallel.tp_step import make_tp_prefill

    mesh, cfg, params = setup
    T, B = 8, 2
    toks = jnp.zeros((T, B), jnp.int32)
    lens = jnp.asarray([T, T], jnp.int32)
    state = init_state(cfg, (B,))
    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    pre = make_tp_prefill(mesh, params)
    with jax.sharding.set_mesh(mesh):
        hlo = pre.lower(p_sh, toks, st_sh, lens).compile().as_text()
    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    assert counts.get("all-reduce", 0) == 3, counts
    assert counts.get("all-gather", 0) == 2, counts
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts


def test_engine_prefill_adapter(setup):
    """make_engine_prefill: unbatched [T] tokens + scalar length through
    the padded shard_map call match forward_seq."""
    from rwkv_tpu.models.rwkv4 import forward_seq
    from rwkv_tpu.parallel.tp_step import make_engine_prefill

    mesh, cfg, params = setup
    toks = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)
    state = init_state(cfg)
    l_ref, s_ref = forward_seq(params, toks, state, parallel=True,
                               length=jnp.asarray(6, jnp.int32))
    p_sh = shard_params(params, mesh)
    pre = make_engine_prefill(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(pre)(p_sh, toks, state,
                                  jnp.asarray(6, jnp.int32))
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=5e-4, atol=5e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

# ---------------------------------------------------------------------------
# tp=1 collective elision (round 4): a model=1 mesh must trace a
# collective-FREE program (the size-1 psums/gathers otherwise lower to
# copies that break XLA fusion — the round-3 7% sharded-prefill overhead),
# and still match the plain forward bit-for-bit in semantics.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_tp1():
    mesh = make_mesh(model=1, data=2)
    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=128, vocab_size=211)
    params = pad_vocab(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg)), multiple=512
    )
    return mesh, cfg, params


def _collective_counts(hlo):
    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def test_tp1_step_elides_all_collectives(setup_tp1):
    mesh, cfg, params = setup_tp1
    B = 2
    state = init_state(cfg, (B,))
    tok = jnp.asarray([3, 150], jnp.int32)
    l_ref, s_ref = forward_step(params, tok, state)

    p_sh = shard_params(params, mesh)
    st_sh = shard_state(state, mesh, batched=True)
    step = make_tp_step(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = step(p_sh, tok, st_sh)
        hlo = step.lower(p_sh, tok, st_sh).compile().as_text()
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
    # the whole point: ZERO model-axis collectives in the traced program
    assert _collective_counts(hlo) == {}, _collective_counts(hlo)


def test_tp1_prefill_elides_all_collectives(setup_tp1):
    """Batched engine prefill (B divisible by the data axis — the pool's
    serving shape) must be collective-free at tp=1. (B=1 on a data>1 mesh
    still pays genuine pad/slice data movement across 'data' — that is
    batch distribution, not model-axis elision scope.)"""
    from rwkv_tpu.models.rwkv4 import forward_seq
    from rwkv_tpu.parallel.tp_step import make_engine_prefill

    mesh, cfg, params = setup_tp1
    T, B = 8, 2
    toks = jnp.asarray(
        np.arange(T * B).reshape(T, B) % cfg.vocab_size, jnp.int32)
    lens = jnp.asarray([T, T - 2], jnp.int32)
    state = init_state(cfg, (B,))
    l_ref, s_ref = forward_seq(params, toks, state, parallel=True,
                               length=lens)
    p_sh = shard_params(params, mesh)
    pre = make_engine_prefill(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(pre)(p_sh, toks, state, lens)
        hlo = jax.jit(pre).lower(p_sh, toks, state,
                                 lens).compile().as_text()
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=5e-4, atol=5e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
    assert _collective_counts(hlo) == {}, _collective_counts(hlo)


def test_engine_prefill_full_chunk_parity(setup):
    """make_engine_prefill(length=None) — the FULL-CHUNK fast path that
    elides the ragged mask/carry selects — matches the masked program fed
    full lengths, unbatched and batched (incl. a batch-pad lane)."""
    from rwkv_tpu.models.rwkv4 import init_state
    from rwkv_tpu.parallel.tp_step import make_engine_prefill

    mesh, cfg, params = setup
    p_sh = shard_params(params, mesh)
    pre = jax.jit(make_engine_prefill(mesh, params))
    T = 8
    toks = jnp.asarray(np.arange(T) % cfg.vocab_size, jnp.int32)
    with jax.sharding.set_mesh(mesh):
        lm, sm = pre(p_sh, toks, init_state(cfg), jnp.asarray(T, jnp.int32))
        lf, sf = pre(p_sh, toks, init_state(cfg), None)
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(lf))
    for a, b in zip(sm, sf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    B = 3  # pads to 4 on the data=2 axis: exercises the garbage-lane slice
    toksB = jnp.stack([toks, (toks + 1) % cfg.vocab_size,
                       (toks + 2) % cfg.vocab_size], 1)
    with jax.sharding.set_mesh(mesh):
        lm, sm = pre(p_sh, toksB, init_state(cfg, (B,)),
                     jnp.full((B,), T, jnp.int32))
        lf, sf = pre(p_sh, toksB, init_state(cfg, (B,)), None)
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(lf))
    for a, b in zip(sm, sf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp1_full_chunk_prefill_elides_all_collectives(setup_tp1):
    """The unmasked full-chunk program stays collective-free at tp=1."""
    from rwkv_tpu.models.rwkv4 import forward_seq, init_state
    from rwkv_tpu.parallel.tp_step import make_engine_prefill

    mesh, cfg, params = setup_tp1
    T, B = 8, 2
    toks = jnp.asarray(
        np.arange(T * B).reshape(T, B) % cfg.vocab_size, jnp.int32)
    state = init_state(cfg, (B,))
    l_ref, s_ref = forward_seq(params, toks, state, parallel=True)
    p_sh = shard_params(params, mesh)
    pre = make_engine_prefill(mesh, params)
    with jax.sharding.set_mesh(mesh):
        l_tp, s_tp = jax.jit(pre)(p_sh, toks, state, None)
        hlo = jax.jit(pre).lower(p_sh, toks, state, None).compile().as_text()
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=5e-4, atol=5e-4)
    for a, b in zip(s_tp, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
    assert _collective_counts(hlo) == {}, _collective_counts(hlo)
