"""Bucketed (padded) prefill: padded tail must be a perfect no-op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import forward_seq, init_params, init_state


@pytest.fixture(scope="module")
def model():
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=16, vocab_size=89)
    return cfg, init_params(jax.random.PRNGKey(4), cfg)


@pytest.mark.parametrize("parallel", [False, True])
def test_padded_equals_exact(model, parallel):
    cfg, params = model
    real = jnp.asarray([5, 9, 13, 2, 77, 31, 8])
    T_real = real.shape[0]
    bucket = 16
    padded = jnp.concatenate([real, jnp.zeros(bucket - T_real, jnp.int32)])

    s0 = init_state(cfg)
    l_exact, s_exact = forward_seq(params, real, s0, parallel=parallel)
    l_pad, s_pad = forward_seq(
        params, padded, s0, parallel=parallel, length=jnp.asarray(T_real)
    )

    np.testing.assert_allclose(np.asarray(l_pad), np.asarray(l_exact), rtol=2e-4, atol=1e-4)
    for a, b in zip(s_pad, s_exact):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_one_bucket_many_lengths_single_compile(model):
    """Different lengths reuse one jitted computation (bucket dims static)."""
    cfg, params = model
    fwd = jax.jit(
        lambda p, t, s, n: forward_seq(p, t, s, length=n), static_argnums=()
    )
    s0 = init_state(cfg)
    bucket = jnp.zeros(8, jnp.int32)
    compiles_before = fwd._cache_size() if hasattr(fwd, "_cache_size") else None
    for n in (1, 3, 8):
        toks = bucket.at[:n].set(jnp.arange(n) + 1)
        logits, _ = fwd(params, toks, s0, jnp.asarray(n))
        assert np.isfinite(np.asarray(logits)).all()
    if compiles_before is not None:
        assert fwd._cache_size() == 1


def test_ragged_batched_prefill_matches_per_stream():
    """[T, B] prefill with per-stream lengths == each stream prefilled
    alone at its own length (ragged batch admission for the pool)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import (forward_seq, init_params, init_state,
                                       quantize_params)

    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=32, vocab_size=97)
    params = quantize_params(init_params(jax.random.PRNGKey(2), cfg))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 97, size=n).tolist() for n in (3, 7, 5)]
    T, B = 8, len(prompts)

    toks = np.zeros((T, B), np.int32)
    for b, p in enumerate(prompts):
        toks[: len(p), b] = p
    lengths = jnp.asarray([len(p) for p in prompts], jnp.int32)

    lg_b, st_b = forward_seq(params, jnp.asarray(toks),
                             init_state(cfg, (B,)), parallel=True,
                             length=lengths)

    for b, p in enumerate(prompts):
        lg1, st1 = forward_seq(params, jnp.asarray(p, jnp.int32),
                               init_state(cfg), parallel=True)
        np.testing.assert_allclose(np.asarray(lg_b[b]), np.asarray(lg1),
                                   rtol=2e-4, atol=2e-4)
        for xb, x1 in zip(st_b, st1):
            np.testing.assert_allclose(np.asarray(xb[:, b]), np.asarray(x1),
                                       rtol=2e-4, atol=2e-4)


def test_zero_length_stream_state_untouched():
    """A stream with 0 valid tokens in a ragged chunk is a strict no-op."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import (forward_seq, init_params, init_state,
                                       quantize_params)

    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=32, vocab_size=97)
    params = quantize_params(init_params(jax.random.PRNGKey(2), cfg))
    B, T = 2, 6
    toks = np.zeros((T, B), np.int32)
    toks[:4, 0] = [5, 6, 7, 8]
    st0 = init_state(cfg, (B,))
    # advance stream 1's state first so it is non-trivial
    _, st0 = forward_seq(params, jnp.asarray(toks), st0, parallel=True,
                         length=jnp.asarray([0, 3], jnp.int32))
    _, st1 = forward_seq(params, jnp.asarray(toks), st0, parallel=True,
                         length=jnp.asarray([4, 0], jnp.int32))
    for a, b in zip(st1, st0):
        np.testing.assert_allclose(np.asarray(a[:, 1]), np.asarray(b[:, 1]),
                                   rtol=0, atol=0)  # stream 1 untouched


def test_full_chunk_unmasked_parity():
    """length=None (the FULL-CHUNK fast path: no mask/carry selects) is
    bit-identical to length=T — plain [T] and batched [T, B]."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import (forward_seq, init_params, init_state,
                                       quantize_params)

    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=32, vocab_size=97)
    params = quantize_params(init_params(jax.random.PRNGKey(2), cfg))
    T, B = 8, 3
    toks = jnp.asarray(np.arange(T) % 97, jnp.int32)

    lm, sm = forward_seq(params, toks, init_state(cfg), parallel=True,
                         length=jnp.asarray(T, jnp.int32))
    lf, sf = forward_seq(params, toks, init_state(cfg), parallel=True)
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(lf))
    for a, b in zip(sm, sf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    toksB = jnp.stack([toks, (toks + 1) % 97, (toks + 2) % 97], 1)
    lm, sm = forward_seq(params, toksB, init_state(cfg, (B,)), parallel=True,
                         length=jnp.full((B,), T, jnp.int32))
    lf, sf = forward_seq(params, toksB, init_state(cfg, (B,)), parallel=True)
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(lf))
    for a, b in zip(sm, sf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
