"""Quantization: round-trip error bounds + qmatmul decomposition identity."""

import jax.numpy as jnp
import numpy as np

from rwkv_tpu.ops.quant import (
    QuantLinear,
    dequantize,
    dequantize4,
    q4matmul,
    qmatmul,
    quantize,
    quantize4,
    unpack4,
)


def test_roundtrip_error_bound(rng):
    w = rng.normal(size=(64, 48)).astype(np.float32)
    q = quantize(w)
    deq = np.asarray(dequantize(q))
    # per-input-channel u8: error <= one quant bucket = range/255 per channel
    span = w.max(axis=1) - w.min(axis=1)
    bucket = span / 255.0
    err = np.abs(deq - w)
    assert (err <= bucket[:, None] + 1e-6).all()


def test_zero_point_refinement_reduces_bias(rng):
    """The mean-fractional-residue refinement makes dequant error ~zero-mean
    per channel (the reference's trick, convert_model.py:117)."""
    w = rng.normal(size=(32, 512)).astype(np.float32)
    q = quantize(w)
    deq = np.asarray(dequantize(q))
    per_channel_bias = (deq - w).mean(axis=1)
    bucket = (w.max(axis=1) - w.min(axis=1)) / 255.0
    assert (np.abs(per_channel_bias) < 0.02 * bucket).all()


def test_constant_row(rng):
    w = np.full((4, 8), 3.25, dtype=np.float32)
    q = quantize(w)
    np.testing.assert_allclose(np.asarray(dequantize(q)), w, atol=1e-6)


def test_qmatmul_equals_dense_on_dequant(rng):
    x = rng.normal(size=(5, 64)).astype(np.float32)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    q = quantize(w)
    y_fast = np.asarray(qmatmul(jnp.asarray(x), q))
    y_ref = x @ np.asarray(dequantize(q))
    np.testing.assert_allclose(y_fast, y_ref, rtol=2e-4, atol=2e-4)


def test_qmatmul_stacked_layer_dim(rng):
    w = rng.normal(size=(3, 16, 24)).astype(np.float32)
    q = quantize(w)
    assert q.w.shape == (3, 16, 24)
    assert q.scale.shape == (3, 16)
    # slice one layer, as lax.scan does
    q0 = QuantLinear(w=q.w[0], scale=q.scale[0], offset=q.offset[0])
    x = rng.normal(size=(16,)).astype(np.float32)
    y = np.asarray(qmatmul(jnp.asarray(x), q0))
    y_ref = x @ np.asarray(dequantize(q0))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_q4_roundtrip_error_bound(rng):
    w = rng.normal(size=(64, 48)).astype(np.float32)
    q = quantize4(w)
    deq = np.asarray(dequantize4(q))
    # per-input-channel 4-bit: error <= one quant bucket = range/15
    span = w.max(axis=1) - w.min(axis=1)
    bucket = span / 15.0
    err = np.abs(deq - w)
    assert (err <= bucket[:, None] + 1e-6).all()


def test_q4_zero_point_refinement(rng):
    w = rng.normal(size=(32, 512)).astype(np.float32)
    q = quantize4(w)
    deq = np.asarray(dequantize4(q))
    per_channel_bias = (deq - w).mean(axis=1)
    bucket = (w.max(axis=1) - w.min(axis=1)) / 15.0
    assert (np.abs(per_channel_bias) < 0.02 * bucket).all()


def test_q4_unpack_range_and_packing(rng):
    """Codes land in [-8, 7]; the split-half nibble layout is invertible."""
    w = rng.normal(size=(16, 24)).astype(np.float32)
    q = quantize4(w)
    assert q.wp.shape == (8, 24) and q.wp.dtype == jnp.int8
    u = np.asarray(unpack4(q.wp))
    assert u.shape == (16, 24)
    assert u.min() >= -8 and u.max() <= 7


def test_q4matmul_equals_dense_on_dequant(rng):
    x = rng.normal(size=(5, 64)).astype(np.float32)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    q = quantize4(w)
    y_fast = np.asarray(q4matmul(jnp.asarray(x), q))
    y_ref = x @ np.asarray(dequantize4(q))
    np.testing.assert_allclose(y_fast, y_ref, rtol=2e-4, atol=2e-4)


def test_q4matmul_two_dot_equals_unpack(rng):
    """The XLA two-dot identity (default; no dense materialization) must
    match the dense-unpack dot — f32 near-exactly, bf16 to dot rounding —
    for both global and blocked packings (q4matmul docstring)."""
    x = rng.normal(size=(5, 128)).astype(np.float32)
    w = rng.normal(size=(128, 48)).astype(np.float32)
    for block in (None, 32):
        q = quantize4(w, block=block)
        xd = jnp.asarray(x)
        y_td = np.asarray(q4matmul(xd, q, variant="two_dot"))
        y_up = np.asarray(q4matmul(xd, q, variant="unpack"))
        np.testing.assert_allclose(y_td, y_up, rtol=2e-4, atol=2e-4)
        y_td16 = np.asarray(q4matmul(xd, q, variant="two_dot",
                                     compute_dtype=jnp.bfloat16))
        y_up16 = np.asarray(q4matmul(xd, q, variant="unpack",
                                     compute_dtype=jnp.bfloat16))
        np.testing.assert_allclose(y_td16, y_up16, rtol=3e-2, atol=3e-1)


def test_q4matmul_two_dot_i8_equals_two_dot(rng):
    """two_dot_i8 is two_dot with the nibble operand's materialization
    pinned at int8 — same arithmetic, so f32 HIGHEST outputs must be
    bit-identical and bf16 within dot rounding."""
    x = rng.normal(size=(5, 128)).astype(np.float32)
    w = rng.normal(size=(128, 48)).astype(np.float32)
    for block in (None, 32):
        q = quantize4(w, block=block)
        xd = jnp.asarray(x)
        y_td = np.asarray(q4matmul(xd, q, variant="two_dot"))
        y_i8 = np.asarray(q4matmul(xd, q, variant="two_dot_i8"))
        np.testing.assert_array_equal(y_td, y_i8)
        y_i816 = np.asarray(q4matmul(xd, q, variant="two_dot_i8",
                                     compute_dtype=jnp.bfloat16))
        y_up16 = np.asarray(q4matmul(xd, q, variant="unpack",
                                     compute_dtype=jnp.bfloat16))
        np.testing.assert_allclose(y_i816, y_up16, rtol=3e-2, atol=3e-1)


def test_q4matmul_auto_dispatch(rng):
    """variant='auto' must pick two_dot only when min(K, O) clears the
    crossover and unpack otherwise (ADVICE round-4 #3: the dispatch was
    untested; round-5: the K-only predicate mis-dispatched 430M's ffn.v,
    K=4096 but O=1024 — BOTH dims must gate). The crossover is moved
    through the public setter so fixed shapes exercise every branch;
    selection is observed by matching the forced variants' exact float
    outputs (two_dot and unpack differ in summation order, so f32
    outputs are bit-distinguishable on random data)."""
    from rwkv_tpu.ops.quant import set_q4_two_dot_min_k

    x = rng.normal(size=(5, 128)).astype(np.float32)
    w = rng.normal(size=(128, 48)).astype(np.float32)
    q = quantize4(w)   # K=128, O=48 -> min 48
    xd = jnp.asarray(x)
    y_td = np.asarray(q4matmul(xd, q, variant="two_dot"))
    y_up = np.asarray(q4matmul(xd, q, variant="unpack"))
    assert not np.array_equal(y_td, y_up), "variants must be bit-distinguishable"
    prev = set_q4_two_dot_min_k(48)  # min(128, 48)=48 >= 48 -> two_dot
    try:
        assert np.array_equal(np.asarray(q4matmul(xd, q)), y_td)
        set_q4_two_dot_min_k(49)  # O=48 below -> unpack even though K=128
        assert np.array_equal(np.asarray(q4matmul(xd, q)), y_up)
        set_q4_two_dot_min_k(129)  # K=128 below too -> unpack
        assert np.array_equal(np.asarray(q4matmul(xd, q)), y_up)
        # wide-O/narrow-K mirror of ffn.k: K=48... not packable (odd
        # halves) — transpose the same weights instead: K=48 is the min.
    finally:
        set_q4_two_dot_min_k(prev)
    wT = rng.normal(size=(48, 128)).astype(np.float32)
    qT = quantize4(wT)  # K=48, O=128 -> min 48
    xT = jnp.asarray(rng.normal(size=(5, 48)).astype(np.float32))
    y_tdT = np.asarray(q4matmul(xT, qT, variant="two_dot"))
    y_upT = np.asarray(q4matmul(xT, qT, variant="unpack"))
    prev = set_q4_two_dot_min_k(49)  # K=48 below -> unpack even though O=128
    try:
        assert np.array_equal(np.asarray(q4matmul(xT, qT)), y_upT)
        set_q4_two_dot_min_k(48)
        assert np.array_equal(np.asarray(q4matmul(xT, qT)), y_tdT)
    finally:
        set_q4_two_dot_min_k(prev)


def test_q4matmul_rejects_unknown_variant(rng):
    """A typo'd variant must raise, not silently run unpack (ADVICE
    round-4 #1)."""
    import pytest

    x = rng.normal(size=(2, 32)).astype(np.float32)
    q = quantize4(rng.normal(size=(32, 16)).astype(np.float32))
    with pytest.raises(ValueError, match="variant"):
        q4matmul(jnp.asarray(x), q, variant="twodot")


def test_q4_stacked_layer_dim(rng):
    from rwkv_tpu.ops.quant import Quant4Linear

    w = rng.normal(size=(3, 16, 24)).astype(np.float32)
    q = quantize4(w)
    assert q.wp.shape == (3, 8, 24)
    assert q.scale.shape == (3, 16)
    q0 = Quant4Linear(wp=q.wp[0], scale=q.scale[0], offset=q.offset[0])
    x = rng.normal(size=(16,)).astype(np.float32)
    y = np.asarray(q4matmul(jnp.asarray(x), q0))
    y_ref = x @ np.asarray(dequantize4(q0))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_mm4_pallas_variants_match_oracle(rng):
    """Both in-kernel unpack strategies (interpret mode) vs the dense
    oracle; two_dot is the production variant (measured at the 2x HBM
    roofline vs mm8 — BENCH_NOTES round-4)."""
    from rwkv_tpu.ops.pallas.mm4 import qmatmul4_pallas

    x = jnp.asarray(rng.normal(size=(3, 512)).astype(np.float32))
    w = rng.normal(size=(512, 384)).astype(np.float32)
    q = quantize4(w)
    ref = np.asarray(jnp.asarray(x) @ dequantize4(q))
    scale = np.abs(ref).max()
    for variant in ("unpack", "two_dot"):
        y = np.asarray(
            qmatmul4_pallas(x, q, interpret=True, variant=variant))
        rel = np.abs(y - ref).max() / scale
        assert rel < 5e-3, (variant, rel)  # bf16-rounded LHS


def test_quant_against_reference_formula(rng):
    """Bit-exactness vs a direct transcription of the converter's math
    (convert_model.py:108-119) computed independently in float64."""
    w = rng.normal(size=(20, 30)).astype(np.float32)  # [in, out]
    x = w.astype(np.float64)
    mini = x.min(axis=1)
    ran = (x - mini[:, None]).max(axis=1) / 255.0
    out = (x - mini[:, None]) / ran[:, None]
    frac = out - np.floor(out)
    mini2 = mini + frac.mean(axis=1) * ran
    expected_q = out.astype(np.uint8)

    q = quantize(w)
    np.testing.assert_array_equal(np.asarray(q.w), expected_q)
    np.testing.assert_allclose(np.asarray(q.scale), ran.astype(np.float32), rtol=0)
    np.testing.assert_allclose(np.asarray(q.offset), mini2.astype(np.float32), rtol=0)


def test_bad_two_dot_impl_env_rejected():
    """A typo'd RWKV_TPU_Q4_TWO_DOT_IMPL must fail at import, not make
    'auto' silently dispatch above-crossover calls to unpack (which would
    mislabel an A/B probe cell)."""
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import rwkv_tpu.ops.quant"],
        env={**os.environ, "RWKV_TPU_Q4_TWO_DOT_IMPL": "i8"},
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode != 0
    assert "RWKV_TPU_Q4_TWO_DOT_IMPL" in r.stderr
