"""Torch binding parity: functional state passing, equivalence with core."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rwkv_tpu.interop.torch import TorchRWKV  # noqa: E402
from rwkv_tpu.models.config import RWKVConfig  # noqa: E402
from rwkv_tpu.models.rwkv4 import (  # noqa: E402
    forward_step,
    init_params,
    init_state,
    quantize_params,
)


@pytest.fixture(scope="module")
def wrapper():
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=16, vocab_size=97)
    params = quantize_params(init_params(jax.random.PRNGKey(12), cfg))
    return TorchRWKV(params=params), cfg, params


def test_forward_matches_core(wrapper):
    w, cfg, params = wrapper
    state_t = w.empty_state()
    logits_t, state_t = w.forward(7, state_t)
    assert isinstance(logits_t, torch.Tensor)
    assert logits_t.shape == (cfg.vocab_size,)

    l_ref, s_ref = forward_step(params, jnp.asarray(7), init_state(cfg))
    np.testing.assert_allclose(logits_t.numpy(), np.asarray(l_ref), rtol=1e-5)
    for t, r in zip(state_t, s_ref):
        np.testing.assert_allclose(t.numpy(), np.asarray(r), rtol=1e-5)


def test_state_is_functional_torch_side(wrapper):
    w, cfg, _ = wrapper
    s0 = w.empty_state()
    l1, _ = w.forward(3, s0)
    l2, _ = w.forward(3, s0)  # same state in -> same logits
    assert torch.equal(l1, l2)


def test_batched(wrapper):
    w, cfg, params = wrapper
    B = 2
    state = [torch.from_numpy(np.asarray(s)) for s in init_state(cfg, (B,))]
    toks = torch.tensor([1, 2])
    logits, state = w.forward_batch(toks, state)
    assert logits.shape == (B, cfg.vocab_size)
