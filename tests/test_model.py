"""Model-level invariants on tiny random models (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_seq,
    forward_step,
    init_params,
    init_state,
    quantize_params,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=24, vocab_size=101)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_seq_equals_stepwise(tiny):
    """forward_seq(T tokens) == T x forward_step — the two mode paths agree
    (the reference's GPT vs one-token forward, rwkv.h:378-380)."""
    cfg, params = tiny
    tokens = np.array([3, 17, 42, 99, 7, 0, 55], dtype=np.int32)
    state0 = init_state(cfg)

    logits_seq, state_seq = forward_seq(params, jnp.asarray(tokens), state0)

    state = state0
    for t in tokens:
        logits_step, state = forward_step(params, jnp.asarray(t), state)

    np.testing.assert_allclose(
        np.asarray(logits_seq), np.asarray(logits_step), rtol=2e-4, atol=1e-4
    )
    for a, b in zip(state_seq, state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4)


def test_parallel_prefill_equals_sequential(tiny):
    cfg, params = tiny
    tokens = jnp.asarray(np.arange(19) % cfg.vocab_size)
    state0 = init_state(cfg)
    l_seq, s_seq = forward_seq(params, tokens, state0, parallel=False)
    l_par, s_par = forward_seq(params, tokens, state0, parallel=True)
    np.testing.assert_allclose(np.asarray(l_par), np.asarray(l_seq), rtol=2e-3, atol=2e-3)
    for a, b in zip(s_par, s_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_state_is_functional(tiny):
    """Same inputs + same state => same outputs; state is never mutated."""
    cfg, params = tiny
    state0 = init_state(cfg)
    before = jax.tree.map(np.asarray, state0)
    l1, _ = forward_step(params, jnp.asarray(5), state0)
    l2, _ = forward_step(params, jnp.asarray(5), state0)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    after = jax.tree.map(np.asarray, state0)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_context_actually_affects_logits(tiny):
    cfg, params = tiny
    state0 = init_state(cfg)
    _, s_a = forward_step(params, jnp.asarray(1), state0)
    _, s_b = forward_step(params, jnp.asarray(2), state0)
    la, _ = forward_step(params, jnp.asarray(3), s_a)
    lb, _ = forward_step(params, jnp.asarray(3), s_b)
    assert not np.allclose(np.asarray(la), np.asarray(lb))


def test_quantized_model_close_to_dense(tiny):
    cfg, params = tiny
    qparams = quantize_params(params)
    tokens = jnp.asarray([1, 2, 3, 4, 5])
    state0 = init_state(cfg)
    l_d, _ = forward_seq(params, tokens, state0)
    l_q, _ = forward_seq(qparams, tokens, state0)
    # u8 weight noise: logits should stay close in distribution terms
    pd = jax.nn.softmax(l_d)
    pq = jax.nn.softmax(l_q)
    tv = 0.5 * float(jnp.abs(pd - pq).sum())
    assert tv < 0.15, f"total-variation {tv} too large for u8 quantization"


def test_batched_streams_match_individual(tiny):
    """PARRALEL-mode equivalent: B independent streams advanced together
    (reference rwkv.cu:238-239) == each advanced alone."""
    cfg, params = tiny
    B = 3
    state_b = init_state(cfg, batch_shape=(B,))
    tokens = jnp.asarray([11, 22, 33])
    logits_b, new_b = forward_step(params, tokens, state_b)
    assert logits_b.shape == (B, cfg.vocab_size)

    for i in range(B):
        s_i = init_state(cfg)
        l_i, n_i = forward_step(params, tokens[i], s_i)
        np.testing.assert_allclose(
            np.asarray(logits_b[i]), np.asarray(l_i), rtol=2e-4, atol=1e-4
        )
        for a, b in zip(new_b, n_i):
            np.testing.assert_allclose(
                np.asarray(a[:, i]), np.asarray(b), rtol=2e-4, atol=1e-4
            )


def test_jit_and_shapes(tiny):
    cfg, params = tiny
    step = jax.jit(forward_step)
    state = init_state(cfg)
    logits, state = step(params, jnp.asarray(0), state)
    assert logits.shape == (cfg.vocab_size,)
    assert logits.dtype == jnp.float32
