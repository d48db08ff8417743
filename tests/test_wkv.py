"""WKV recurrence: step vs scan vs parallel(associative) vs float64 numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.ops.wkv import (
    WKVChannelState,
    empty_channel_state,
    wkv_parallel,
    wkv_scan,
    wkv_step,
)


def numpy_wkv_oracle(k, v, w, u, aa, bb, pp):
    """Float64 sequential reference (stable max-shift form, matching the
    reference Vulkan shader's recurrence without its +1e-4 denominator fudge:
    /root/reference/include/rwkv/vulkan/ops/wkv/wkv.comp:51-77)."""
    T = k.shape[0]
    ys = np.empty_like(k, dtype=np.float64)
    aa, bb, pp = aa.astype(np.float64).copy(), bb.astype(np.float64).copy(), pp.astype(np.float64).copy()
    k64, v64 = k.astype(np.float64), v.astype(np.float64)
    w64, u64 = w.astype(np.float64), u.astype(np.float64)
    for t in range(T):
        ww = u64 + k64[t]
        q = np.maximum(pp, ww)
        e1, e2 = np.exp(pp - q), np.exp(ww - q)
        ys[t] = (e1 * aa + e2 * v64[t]) / (e1 * bb + e2)
        ww2 = pp + w64
        p2 = np.maximum(ww2, k64[t])
        f1, f2 = np.exp(ww2 - p2), np.exp(k64[t] - p2)
        aa = f1 * aa + f2 * v64[t]
        bb = f1 * bb + f2
        pp = p2
    return ys, (aa, bb, pp)


def make_inputs(rng, T=17, E=8, k_scale=3.0):
    k = rng.normal(size=(T, E)).astype(np.float32) * k_scale
    v = rng.normal(size=(T, E)).astype(np.float32)
    w = -np.exp(rng.normal(size=(E,)).astype(np.float32))  # decay < 0
    u = rng.normal(size=(E,)).astype(np.float32)
    return k, v, w, u


def test_scan_matches_oracle(rng):
    k, v, w, u = make_inputs(rng)
    state = empty_channel_state((k.shape[1],))
    ys, final = wkv_scan(jnp.asarray(k), jnp.asarray(v), state, jnp.asarray(w), jnp.asarray(u))
    ys_ref, (aa, bb, pp) = numpy_wkv_oracle(
        k, v, w, u, np.zeros(k.shape[1]), np.zeros(k.shape[1]), np.full(k.shape[1], -1e30)
    )
    np.testing.assert_allclose(np.asarray(ys), ys_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(final.aa), aa, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(final.bb), bb, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(final.pp), pp, rtol=2e-4, atol=2e-4)


def test_step_composes_to_scan(rng):
    k, v, w, u = make_inputs(rng, T=9)
    E = k.shape[1]
    state = empty_channel_state((E,))
    kj, vj, wj, uj = map(jnp.asarray, (k, v, w, u))
    ys_scan, final_scan = wkv_scan(kj, vj, state, wj, uj)

    s = empty_channel_state((E,))
    ys = []
    for t in range(k.shape[0]):
        y, s = wkv_step(kj[t], vj[t], s, wj, uj)
        ys.append(y)
    # atol matters: step-vs-scan compile to different fusions, so outputs
    # differ in the last ulp — a near-zero element fails bare rtol.
    np.testing.assert_allclose(np.stack(ys), np.asarray(ys_scan),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(s, final_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("T", [1, 2, 13, 64])
@pytest.mark.parametrize("k_scale", [1.0, 8.0, 40.0])
def test_parallel_matches_scan(rng, T, k_scale):
    """Associative-scan prefill == sequential scan, incl. large-k stress."""
    k, v, w, u = make_inputs(rng, T=T, k_scale=k_scale)
    E = k.shape[1]
    state = empty_channel_state((E,))
    kj, vj, wj, uj = map(jnp.asarray, (k, v, w, u))
    ys_s, fin_s = wkv_scan(kj, vj, state, wj, uj)
    ys_p, fin_p = wkv_parallel(kj, vj, state, wj, uj)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(fin_p.aa), np.asarray(fin_s.aa), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(fin_p.bb), np.asarray(fin_s.bb), rtol=3e-4, atol=3e-5)


def test_parallel_resumes_from_nonempty_state(rng):
    """Chunked prefill: scan chunk1 -> parallel chunk2 == full scan."""
    k, v, w, u = make_inputs(rng, T=24)
    E = k.shape[1]
    kj, vj, wj, uj = map(jnp.asarray, (k, v, w, u))
    state = empty_channel_state((E,))
    ys_full, fin_full = wkv_scan(kj, vj, state, wj, uj)

    _, mid = wkv_scan(kj[:11], vj[:11], state, wj, uj)
    ys_tail, fin = wkv_parallel(kj[11:], vj[11:], mid, wj, uj)
    np.testing.assert_allclose(np.asarray(ys_tail), np.asarray(ys_full[11:]), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(fin.aa), np.asarray(fin_full.aa), rtol=3e-4, atol=3e-5)


def test_no_overflow_long_sequence(rng):
    """The unstable reference-CUDA form overflows here; ours must not."""
    k, v, w, u = make_inputs(rng, T=2048, E=4, k_scale=5.0)
    state = empty_channel_state((4,))
    ys, fin = wkv_scan(*map(jnp.asarray, (k, v)), state, jnp.asarray(w), jnp.asarray(u))
    assert np.isfinite(np.asarray(ys)).all()
    assert np.isfinite(np.asarray(fin.aa)).all()
    assert np.isfinite(np.asarray(fin.bb)).all()
