"""LayerNorm over the channel dim.

The reference implements this as a two-pass atomicAdd mean/variance reduction
plus a scale kernel (include/rwkv/cuda/rwkv.cu:40-57, 412-465) with weights
packed into one `layernorms` tensor. Here it's three lines of jnp that XLA
fuses into neighbouring ops; weight/bias live unpacked in the param pytree
(io/binfmt.py handles the packed layout for checkpoint parity).

Note the reference normalizes by the *population* variance with no epsilon
(rwkv.cu:446-465 divides by sqrt(var)); we add a tiny eps for safety — it is
below the u8 quantization noise floor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, *, eps: float = 1e-8) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return centered * jax.lax.rsqrt(var + eps) * weight + bias
