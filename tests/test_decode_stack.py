"""Fused Pallas decode-stack kernel vs the pure-JAX oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_step,
    init_params,
    init_state,
    quantize_params,
    signedize_params,
)
from rwkv_tpu.ops.pallas.decode_stack import forward_step_fused
from rwkv_tpu.ops.pallas.mm8 import qmatmul_pallas
from rwkv_tpu.ops.quant import dequantize, qmatmul, quantize, to_signed


@pytest.fixture(scope="module")
def model():
    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=256, vocab_size=384)
    params = signedize_params(
        quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    )
    return cfg, params


def test_to_signed_identity(rng):
    w = rng.normal(size=(32, 48)).astype(np.float32)
    q = quantize(w)
    qs = to_signed(q)
    assert qs.w.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(dequantize(qs)), np.asarray(dequantize(q)), rtol=1e-5, atol=1e-5
    )
    x = rng.normal(size=(3, 32)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(qmatmul(jnp.asarray(x), qs)),
        np.asarray(qmatmul(jnp.asarray(x), q)),
        rtol=1e-4, atol=1e-4,
    )


def test_mm8_pallas_interpret(rng):
    w = rng.normal(size=(96, 200)).astype(np.float32)
    q = to_signed(quantize(w))
    x = rng.normal(size=(3, 96)).astype(np.float32)
    y_ref = np.asarray(qmatmul(jnp.asarray(x), q))
    y_pal = np.asarray(qmatmul_pallas(jnp.asarray(x), q, interpret=True))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B", [1, 2])
def test_fused_step_matches_oracle(model, B):
    cfg, params = model
    if B == 1:
        state = init_state(cfg)
        tok = jnp.asarray(5)
    else:
        state = init_state(cfg, (B,))
        tok = jnp.asarray([5, 9][:B])

    l_ref, s_ref = forward_step(params, tok, state)
    l_f, s_f = forward_step_fused(params, tok, state, tile=128, interpret=True,
                                  head_a8=False)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref), rtol=1e-4, atol=1e-4)
    for a, b in zip(s_f, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_step_state_carry(model):
    """Multi-step decode: fused path tracks oracle over 4 tokens."""
    cfg, params = model
    s_r = s_f = init_state(cfg, (2,))
    for t in ([3, 7], [1, 2], [9, 9], [100, 50]):
        tok = jnp.asarray(t)
        l_r, s_r = forward_step(params, tok, s_r)
        l_f, s_f = forward_step_fused(params, tok, s_f, tile=128, interpret=True,
                                      head_a8=False)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_r), rtol=2e-4, atol=2e-4)


def test_head_a8_close_enough(model):
    """W8A8 head: activation-quant noise stays well under the weight-quant
    noise floor (sub-1% relative on logits)."""
    cfg, params = model
    state = init_state(cfg)
    tok = jnp.asarray(5)
    l_exact, _ = forward_step_fused(params, tok, state, tile=128,
                                    interpret=True, head_a8=False)
    l_a8, _ = forward_step_fused(params, tok, state, tile=128,
                                 interpret=True, head_a8=True)
    scale = float(jnp.abs(l_exact).max())
    err = float(jnp.abs(l_a8 - l_exact).max())
    assert err < 0.01 * scale + 0.02, (err, scale)
    # top-1 prediction unchanged
    assert int(jnp.argmax(l_a8)) == int(jnp.argmax(l_exact))


def test_fused_step_a8_close_to_oracle(model):
    """W8A8 path: per-row dynamic activation quant adds bounded noise.

    The bound here is loose (int8 activations carry ~0.4% relative error
    per matvec) but the outputs must stay strongly correlated with the
    oracle and the recurrent state must not diverge over several steps."""
    cfg, params = model
    s_r = s_f = init_state(cfg)
    for t in (3, 1, 9, 100):
        tok = jnp.asarray(t)
        l_r, s_r = forward_step(params, tok, s_r)
        l_f, s_f = forward_step_fused(params, tok, s_f, tile=128,
                                      interpret=True, a8=True)
    a, b = np.asarray(l_f), np.asarray(l_r)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 0.05, rel
    # greedy decisions should agree on a confident argmax
    assert np.argmax(a) == np.argmax(b)


def test_pick_tile_invariants():
    from rwkv_tpu.ops.pallas.decode_stack import pick_head_tile, pick_tile

    for e in (128, 256, 768, 1024, 2048, 2560, 4096, 5120):
        t = pick_tile(e)
        assert e % t == 0 and t % 128 == 0
        assert 16 * e * t <= 15 * 1024 * 1024
        for vp in (50304, 50688, 50432):
            ht = pick_head_tile(e, t, vp)
            assert vp % ht == 0 and ht % 128 == 0
            # double-buffered head blocks + 7 layer streams fit the budget
            assert 14 * e * t + 2 * e * ht <= 15 * 1024 * 1024


def test_auto_head_tile_batch_accounting():
    """The q8 head-tile budget subtracts batch-scaled scratch exactly where
    receipts demand it (BENCH_NOTES round-4): at 14B (E=5120) the
    unsubtracted ht=512 pick OOMs scoped VMEM by 316K under a fused-embed
    B=8 while ht=384 measures 431.6 agg tok/s; every measured-good pick
    (B=1 at all sizes; B=8 at E<=2560) must be byte-identical to before."""
    from rwkv_tpu.ops.pallas.decode_stack import auto_head_tile, pick_tile

    vp = 50688
    # the regression config: 14B fused-embed B=8 drops one notch
    assert auto_head_tile(5120, pick_tile(5120), vp, 8,
                          fuse_embed=True) == 384
    # B=1 keeps every measured pick (the razor-thin 14B margin included)
    for e, want in ((1024, 2816), (2048, 1536), (2560, 1152),
                    (4096, 768), (5120, 512)):
        assert auto_head_tile(e, pick_tile(e), vp, 1,
                              fuse_embed=True) == want, e
    # measured-good B=8 picks at E<=4096 unchanged (serving sweeps)
    for e, want in ((1024, 2816), (2048, 1536), (2560, 1152), (4096, 768)):
        assert auto_head_tile(e, pick_tile(e), vp, 8,
                              fuse_embed=True) == want, e
    # unfused embed at E>=4096 was never compiled and models over-budget
    # at the old pick — it gets the accounted (safe) tile at any batch
    for b in (1, 8):
        assert auto_head_tile(5120, pick_tile(5120), vp, b,
                              fuse_embed=False) == 384, b
        assert auto_head_tile(4096, pick_tile(4096), vp, b,
                              fuse_embed=False) == 768, b


def test_engine_repads_unaligned_vocab():
    """In-memory params with a vocab that isn't lane-aligned: load_params
    must repad so the fused head can engage (and ban the padding)."""
    import numpy as np

    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import init_params as ip, quantize_params as qp
    from rwkv_tpu.runtime.engine import RWKV

    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=128, vocab_size=201)
    eng = RWKV()
    eng.load_params(qp(ip(jax.random.PRNGKey(0), cfg)), use_fused=True)
    assert eng.config.vocab_size % 128 == 0
    assert eng._true_vocab == 201
    lb = np.asarray(eng.params.logit_bias)
    assert (lb[:201] == 0).all() and (lb[201:] < -1e8).all()


def test_pretiled_matches_oracle(model):
    """Contiguous-block weight layout (pretile_params): same math, and the
    prefill/XLA path must also consume the 4-D weights (qmatmul einsum)."""
    from rwkv_tpu.models.rwkv4 import forward_seq
    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg, params = model
    pt = pretile_params(params, tile=128)
    # fused kernel on pretiled weights
    state = init_state(cfg)
    l_ref, s_ref = forward_step(params, jnp.asarray(7), state)
    l_pt, s_pt = forward_step_fused(pt, jnp.asarray(7), state, interpret=True)
    np.testing.assert_allclose(np.asarray(l_pt), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-4)
    # XLA sequence path on the same pretiled params (engine prefill reuse)
    toks = jnp.asarray([3, 1, 4], jnp.int32)
    lg_ref, st_ref = forward_seq(params, toks, init_state(cfg), parallel=True)
    lg_pt, st_pt = forward_seq(pt, toks, init_state(cfg), parallel=True)
    np.testing.assert_allclose(np.asarray(lg_pt), np.asarray(lg_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(st_pt, st_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_embed_clamps_oob_token(model):
    """Out-of-range token ids must clamp (XLA gather semantics), not read
    out-of-bounds through the scalar-prefetch block index."""
    cfg, params = model
    state = init_state(cfg)
    l_hi, _ = forward_step_fused(params, jnp.asarray(10_000_000), state,
                                 interpret=True)
    l_last, _ = forward_step_fused(params, jnp.asarray(cfg.vocab_size - 1),
                                   state, interpret=True)
    np.testing.assert_allclose(np.asarray(l_hi), np.asarray(l_last),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("E,L,V,B,a8", [
    (128, 1, 131, 1, False),   # single layer, odd vocab (pads to 256)
    (256, 2, 512, 5, False),   # mid batch, vocab == multiple already
    (384, 2, 200, 8, False),   # E with tile=384, full Bp batch
    (128, 3, 259, 2, True),    # a8 path with odd vocab
])
def test_fused_step_config_sweep(E, L, V, B, a8):
    """Shape/config sweep: every (E, L, vocab, batch, a8) combination must
    track the oracle. Guards the kernel's static-layout plumbing (tile and
    head-tile pickers, padding, multi-row fused embed, a8 scratch) against
    refactors."""
    from rwkv_tpu.models.rwkv4 import pad_vocab

    cfg = RWKVConfig.tiny_test(n_layer=L, n_embd=E, vocab_size=V)
    params = signedize_params(
        pad_vocab(quantize_params(init_params(jax.random.PRNGKey(E + L), cfg)),
                  multiple=128)
    )
    state = init_state(cfg) if B == 1 else init_state(cfg, (B,))
    tok = jnp.asarray(5) if B == 1 else jnp.asarray([i * 7 % V for i in range(B)])

    l_ref, s_ref = forward_step(params, tok, state)
    l_f, s_f = forward_step_fused(params, tok, state, interpret=True, a8=a8)
    assert l_f.shape == l_ref.shape
    if a8:
        # correlate only REAL-token logits: the shared -1e9 pad bias makes
        # whole-array correlation vacuously ~1.0
        a = np.asarray(l_f)[..., :V].ravel()
        b = np.asarray(l_ref)[..., :V].ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.999
    else:
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                                   rtol=1e-4, atol=1e-4)
        for x, y in zip(s_f, s_ref):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-4)


def test_fused_embed_batch16(model):
    """fuse_embed past the auto B<=8 threshold: an explicitly-forced B=16
    single-launch step matches the oracle (one gathered emb-row ref per
    batch element; auto keeps B<=8 — the measured-win regime)."""
    cfg, params = model
    B = 16
    state = init_state(cfg, (B,))
    tok = jnp.asarray([(i * 13) % cfg.vocab_size for i in range(B)])
    l_ref, s_ref = forward_step(params, tok, state)
    l_f, s_f = forward_step_fused(params, tok, state, tile=128, interpret=True,
                                  fuse_embed=True)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(s_f, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def model_q4():
    from rwkv_tpu.models.rwkv4 import pad_vocab, quantize_params_q4

    cfg = RWKVConfig.tiny_test(n_layer=3, n_embd=256, vocab_size=384)
    params = pad_vocab(
        quantize_params_q4(init_params(jax.random.PRNGKey(0), cfg), tile=128),
        multiple=128,
    )
    return cfg, params


@pytest.mark.parametrize("B", [1, 2])
def test_q4_fused_step_matches_oracle(model_q4, B):
    """4-bit fused kernel vs the XLA q4matmul oracle on the SAME packed
    params: quantization error cancels, so only the _dot4/_fold4 identity
    is under test (both sides f32 -> tight tolerance)."""
    cfg, params = model_q4
    if B == 1:
        state = init_state(cfg)
        tok = jnp.asarray(5)
    else:
        state = init_state(cfg, (B,))
        tok = jnp.asarray([5, 9][:B])

    l_ref, s_ref = forward_step(params, tok, state)
    l_f, s_f = forward_step_fused(params, tok, state, tile=128,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(s_f, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_q4_bf16_dot_close_to_f32(model_q4):
    """q4_bf16=True (bf16 two-dot operands, f32 accumulation) must track
    the f32 q4 kernel to bf16-activation rounding: nibble/packed weight
    values are integers — exact in bf16 — so only the folded activations
    round (~0.4% rel, mm8's lhs_bf16 noise class)."""
    cfg, params = model_q4
    state = init_state(cfg, (2,))
    tok = jnp.asarray([5, 9])
    l_f32, s_f32 = forward_step_fused(params, tok, state, tile=128,
                                      interpret=True)
    l_bf, s_bf = forward_step_fused(params, tok, state, tile=128,
                                    interpret=True, q4_bf16=True)
    assert not np.array_equal(np.asarray(l_bf), np.asarray(l_f32)), \
        "bf16 dots must actually engage (bit-identical means the flag is dead)"
    np.testing.assert_allclose(np.asarray(l_bf), np.asarray(l_f32),
                               rtol=3e-2, atol=3e-2)
    for a, b in zip(s_bf, s_f32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)


def test_q4_fused_state_carry(model_q4):
    cfg, params = model_q4
    s_r = s_f = init_state(cfg, (2,))
    for t in ([3, 7], [1, 2], [9, 9], [100, 50]):
        tok = jnp.asarray(t)
        l_r, s_r = forward_step(params, tok, s_r)
        l_f, s_f = forward_step_fused(params, tok, s_f, tile=128,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_r),
                                   rtol=1e-4, atol=1e-4)


def test_q4_pretiled_matches_oracle(model_q4):
    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg, params = model_q4
    pre = pretile_params(params, tile=128)
    assert pre.att.key.wp.ndim == 4  # [L, O/t, E/2, t]
    state = init_state(cfg, (2,))
    tok = jnp.asarray([5, 9])
    l_ref, _ = forward_step(params, tok, state)
    l_f, _ = forward_step_fused(pre, tok, state, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-4)


def test_q4_quality_close_to_dense(model_q4):
    """End-to-end sanity that 4-bit weights stay usable: q4 logits
    correlate with the DENSE model's logits (quantization noise present
    but structured output preserved)."""
    cfg, q4p = model_q4
    dense = init_params(jax.random.PRNGKey(0), cfg)
    state = init_state(cfg)
    tok = jnp.asarray(5)
    l_d, _s = forward_step(dense, tok, state)
    l_q, _s = forward_step(q4p, tok, state)
    a = np.asarray(l_q)[: cfg.vocab_size]
    b = np.asarray(l_d)[: cfg.vocab_size]
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_q4_tile_mismatch_raises(model_q4):
    cfg, params = model_q4  # packed with block=128 on the row-tiled fams
    state = init_state(cfg)
    tok = jnp.asarray(5)
    with pytest.raises(ValueError, match="block"):
        forward_step_fused(params, tok, state, tile=256, interpret=True)
