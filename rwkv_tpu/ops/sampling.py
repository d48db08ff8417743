"""On-device samplers.

The reference samples on the CPU in float64 via vendored NumCpp
(include/rwkv/sampler/typical.h:20-58), forcing a 50277-float D2H copy every
token. Here sampling is jnp on the same chip as the model, jitted and fused
with the forward step, so only the chosen token id crosses to the host.

`typical` reproduces the reference's typical-sampling semantics:
  1. p = softmax(logits); surprisal s = -log p
  2. entropy H = sum(p * s);   shifted = |s - H|
  3. keep the tokens with smallest `shifted` until their cumulative
     probability reaches tau (the reference's cutoff index arithmetic,
     typical.h:40-50, keeps exactly the positions with
     shifted <= sorted_shifted[#(cumsum < tau)])
  4. temperature is applied as probs ** (1/temp) (typical.h:51-53 — note:
     on probabilities, post-cutoff, exactly as the reference does)
  5. draw from the renormalized distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """Argmax over the last dim."""
    return jnp.argmax(logits, axis=-1)


def typical(
    key: jax.Array,
    logits: jax.Array,
    temp: float | jax.Array = 0.9,
    tau: float | jax.Array = 0.8,
) -> jax.Array:
    """Typical sampling (Meister et al.), reference-parity semantics.

    logits: [..., V] float. Returns int32 token ids of shape logits.shape[:-1].
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)

    order = jnp.argsort(shifted, axis=-1)
    sorted_shifted = jnp.take_along_axis(shifted, order, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # reference: cutoff = #(cum < tau); threshold = sorted_shifted[cutoff]
    cutoff = jnp.sum((cum < tau).astype(jnp.int32), axis=-1, keepdims=True)
    cutoff = jnp.minimum(cutoff, shifted.shape[-1] - 1)
    threshold = jnp.take_along_axis(sorted_shifted, cutoff, axis=-1)
    kept = jnp.where(shifted > threshold, 0.0, probs)

    temp = jnp.asarray(temp, jnp.float32)
    kept = jnp.where(temp != 1.0, jnp.power(kept, 1.0 / temp), kept)

    # categorical over unnormalized weights via log-space Gumbel trick
    logw = jnp.where(kept > 0, jnp.log(kept), -jnp.inf)
    return jax.random.categorical(key, logw, axis=-1)


def sample_logits(
    key: jax.Array,
    logits: jax.Array,
    *,
    temp: float = 1.0,
    top_p: float = 1.0,
) -> jax.Array:
    """Standard nucleus/temperature sampling (extra capability vs reference)."""
    logits = logits.astype(jnp.float32)
    if top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # smallest probability still inside the nucleus
        keep_sorted = cum - sorted_probs < top_p
        pmin = jnp.min(
            jnp.where(keep_sorted, sorted_probs, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(probs >= pmin, logits, -jnp.inf)
    if temp != 1.0:
        logits = logits / jnp.maximum(temp, 1e-6)
    return jax.random.categorical(key, logits, axis=-1)
