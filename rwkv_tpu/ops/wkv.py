"""The WKV recurrence — RWKV-v4's time-mix core — in numerically stable form.

Per channel, with decay w = -exp(time_decay) (negative; baked in by the
converter, reference converter/convert_model.py:58) and bonus u = time_first,
the running state is (aa, bb, pp) where the true accumulators are
A = aa * e^pp, B = bb * e^pp:

  output for token t (uses state *before* absorbing token t):
      q   = max(pp, u + k_t)
      y_t = (e^{pp-q} * aa + e^{u+k_t-q} * v_t) / (e^{pp-q} * bb + e^{u+k_t-q})
  state update:
      p'  = max(pp + w, k_t)
      aa' = e^{pp+w-p'} * aa + e^{k_t-p'} * v_t
      bb' = e^{pp+w-p'} * bb + e^{k_t-p'}
      pp' = p'

This is the max-shift form used by the reference's Vulkan backend
(include/rwkv/vulkan/ops/wkv/wkv.comp:51-77) and upstream ChatRWKV — NOT the
reference CUDA kernel's simplified unstable form (include/rwkv/cuda/
rwkv.cu:242-255), which overflows for long sequences. Empty state is
aa=bb=0, pp=-1e30 (converter/convert_model.py:19).

Two sequence strategies:
  * wkv_scan        — lax.scan over tokens. O(T) work, sequential; the decode
                      path (T=1) and the default prefill path.
  * wkv_parallel    — associative scan (O(T log T) work, O(log T) depth).
                      The state transition is an elementwise affine map
                      X' = e^w * X + e^k * [v, 1], and compositions of
                      (log-scale, mantissa) affine maps are associative —
                      so prompt ingest parallelizes across the sequence,
                      something the reference's serial in-kernel token loop
                      (rwkv.cu:227) cannot do.

All math is float32: TPUs have no f64 ALUs; the max-shift form keeps every
exponent argument <= 0 so f32 range is never stressed, and f32 mantissa error
here is far below the u8 weight-quantization noise floor.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class WKVChannelState(NamedTuple):
    """Per-channel WKV accumulator state; each leaf [..., E]."""

    aa: jax.Array
    bb: jax.Array
    pp: jax.Array


def empty_channel_state(shape, dtype=jnp.float32) -> WKVChannelState:
    return WKVChannelState(
        aa=jnp.zeros(shape, dtype),
        bb=jnp.zeros(shape, dtype),
        pp=jnp.full(shape, -1e30, dtype),
    )


def wkv_step(
    k: jax.Array,
    v: jax.Array,
    state: WKVChannelState,
    w: jax.Array,
    u: jax.Array,
) -> Tuple[jax.Array, WKVChannelState]:
    """One token of the WKV recurrence. All args broadcast over [..., E]."""
    aa, bb, pp = state
    ww = u + k
    q = jnp.maximum(pp, ww)
    e1 = jnp.exp(pp - q)
    e2 = jnp.exp(ww - q)
    y = (e1 * aa + e2 * v) / (e1 * bb + e2)

    ww2 = pp + w
    p2 = jnp.maximum(ww2, k)
    f1 = jnp.exp(ww2 - p2)
    f2 = jnp.exp(k - p2)
    new = WKVChannelState(aa=f1 * aa + f2 * v, bb=f1 * bb + f2, pp=p2)
    return y, new


def wkv_scan(
    k: jax.Array,
    v: jax.Array,
    state: WKVChannelState,
    w: jax.Array,
    u: jax.Array,
    mask: jax.Array | None = None,
) -> Tuple[jax.Array, WKVChannelState]:
    """Sequential WKV over a sequence. k, v: [T, ..., E]. Returns y [T, ..., E].

    mask: optional [T] bool; False positions are padding — their state update
    is skipped entirely (identity transition), enabling bucketed prefill
    without recompilation per prompt length.
    """
    if mask is None:
        def body(carry, kv):
            kt, vt = kv
            y, new = wkv_step(kt, vt, carry, w, u)
            return new, y

        final, ys = jax.lax.scan(body, state, (k, v))
        return ys, final

    def body(carry, kvm):
        kt, vt, mt = kvm
        y, new = wkv_step(kt, vt, carry, w, u)
        new = WKVChannelState(*(jnp.where(mt, n, c) for n, c in zip(new, carry)))
        return new, y

    final, ys = jax.lax.scan(body, state, (k, v, mask))
    return ys, final


def wkv_parallel(
    k: jax.Array,
    v: jax.Array,
    state: WKVChannelState,
    w: jax.Array,
    u: jax.Array,
    mask: jax.Array | None = None,
) -> Tuple[jax.Array, WKVChannelState]:
    """Parallel (associative-scan) WKV over a sequence. k, v: [T, ..., E].

    Represents the affine state map of a token span as (lam, ca, cb, pc):
      A' = e^lam * A + ca * e^pc ;  B' = e^lam * B + cb * e^pc
    (lam stored directly in log space; the additive part as mantissa ca/cb
    with shared exponent pc). Composition of two spans:
      lam = lam1 + lam2
      pc  = max(pc1 + lam2, pc2)
      ca  = ca1 * e^{pc1+lam2-pc} + ca2 * e^{pc2-pc}     (same for cb)
    which is associative, so jax.lax.associative_scan gives all prefix states
    in O(log T) depth. Output y_t then needs the *exclusive* prefix state
    combined with the initial state, plus the elementwise bonus term.
    """
    lam = jnp.broadcast_to(w, k.shape).astype(k.dtype)  # per-token decay e^w
    ca = v
    cb = jnp.ones_like(k)
    pc = k
    if mask is None:
        mask_b = None
    else:
        # Padding tokens become exact identity maps: zero decay, -inf
        # payload. mask is [T] (shared) or k.shape[:-1] (per-stream ragged
        # lengths, e.g. [T, B] batched prefill).
        if mask.ndim == 1:
            mask_b = jnp.reshape(mask, (mask.shape[0],) + (1,) * (k.ndim - 1))
        else:
            assert mask.shape == k.shape[:-1], (mask.shape, k.shape)
            mask_b = mask[..., None]
        lam = jnp.where(mask_b, lam, 0.0)
        pc = jnp.where(mask_b, pc, -1e38)

    def combine(left, right):
        lam1, ca1, cb1, pc1 = left
        lam2, ca2, cb2, pc2 = right
        lam_o = lam1 + lam2
        shifted = pc1 + lam2
        pc_o = jnp.maximum(shifted, pc2)
        e1 = jnp.exp(shifted - pc_o)
        e2 = jnp.exp(pc2 - pc_o)
        return lam_o, ca1 * e1 + ca2 * e2, cb1 * e1 + cb2 * e2, pc_o

    # Inclusive prefix over spans [0..t]; each token's own span is
    # (lam=w, c=e^k [v,1]) — i.e. decay applied before its own contribution,
    # matching the state-update order of wkv_step.
    lam_i, ca_i, cb_i, pc_i = jax.lax.associative_scan(
        combine, (lam, ca, cb, pc), axis=0
    )

    # Fold the initial state through each inclusive prefix map to get the
    # state *after* token t: X_t = e^{lam} X_0 + c * e^{pc}.
    aa0, bb0, pp0 = state
    # State after t, as mantissa/exponent: p_t = max(pp0 + lam, pc)
    pp_t = jnp.maximum(pp0 + lam_i, pc_i)
    g1 = jnp.exp(pp0 + lam_i - pp_t)
    g2 = jnp.exp(pc_i - pp_t)
    aa_t = g1 * aa0 + g2 * ca_i
    bb_t = g1 * bb0 + g2 * cb_i

    # Exclusive (pre-token) states: shift by one, prepend the initial state.
    aa_prev = jnp.concatenate([aa0[None], aa_t[:-1]], axis=0)
    bb_prev = jnp.concatenate([bb0[None], bb_t[:-1]], axis=0)
    pp_prev = jnp.concatenate([pp0[None], pp_t[:-1]], axis=0)

    ww = u + k
    q = jnp.maximum(pp_prev, ww)
    e1 = jnp.exp(pp_prev - q)
    e2 = jnp.exp(ww - q)
    y = (e1 * aa_prev + e2 * v) / (e1 * bb_prev + e2)

    final = WKVChannelState(aa=aa_t[-1], bb=bb_t[-1], pp=pp_t[-1])
    return y, final
