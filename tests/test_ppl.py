"""Perplexity harness: sanity + chunking invariance + quantization delta."""

import jax
import numpy as np
import pytest

from rwkv_tpu.eval.ppl import compare_quantization, evaluate_nll
from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import init_params, quantize_params


@pytest.fixture(scope="module")
def setup():
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=32, vocab_size=149)
    params = init_params(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=300)
    return cfg, params, ids


def test_uniform_baseline(setup):
    """Random-init model on random tokens: ppl near vocab size."""
    cfg, params, ids = setup
    r = evaluate_nll(params, ids, chunk=64)
    assert r["tokens"] == len(ids) - 1
    assert 0.3 * cfg.vocab_size < r["ppl"] < 3 * cfg.vocab_size


def test_chunk_invariance(setup):
    """Same NLL whatever the chunk size (state carries exactly)."""
    cfg, params, ids = setup
    a = evaluate_nll(params, ids, chunk=37)
    b = evaluate_nll(params, ids, chunk=128)
    assert abs(a["nll"] - b["nll"]) < 2e-3


def test_quant_delta_small(setup):
    cfg, params, ids = setup
    q = quantize_params(params)
    r = compare_quantization(params, q, ids, chunk=64)
    # random weights + u8: delta must be tiny relative to absolute ppl
    assert abs(r["nll_delta"]) < 0.05, r


def test_q4_delta_small(setup):
    """4-bit quality gate (synthetic analog of the BASELINE ppl row):
    q4 NLL stays close to dense — noisier than u8 (16 levels vs 256)
    but structurally sound."""
    from rwkv_tpu.models.rwkv4 import quantize_params_q4

    cfg, params, ids = setup
    q = quantize_params_q4(params, tile=32)
    r = compare_quantization(params, q, ids, chunk=64)
    assert abs(r["nll_delta"]) < 0.5, r


def test_too_short_input(setup):
    cfg, params, _ = setup
    with pytest.raises(ValueError):
        evaluate_nll(params, np.asarray([5]))


def test_bf16_prefill_nll_close_to_f32(setup):
    """bf16-matmul prefill (the fast path): NLL shift must stay within the
    same budget as quantization itself (BASELINE: nll delta <= 0.05)."""
    import jax.numpy as jnp

    cfg, params, ids = setup
    q = quantize_params(params)
    f32 = evaluate_nll(q, ids, chunk=64)
    bf16 = evaluate_nll(q, ids, chunk=64, compute_dtype=jnp.bfloat16)
    assert abs(bf16["nll"] - f32["nll"]) < 0.05, (bf16["nll"], f32["nll"])
