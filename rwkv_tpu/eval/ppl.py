"""Perplexity evaluation harness.

The quantization quality gate (BASELINE.md: u8 ppl Δ vs the fp32 reference
path <= 0.05) — a capability the reference repo lacks entirely (its only
test is an assertion-free smoke script, tests/test_pybind.py).

Teacher-forced NLL over a token stream, chunked through forward_seq with
state carried across chunks, so arbitrarily long eval sets run in fixed
memory. All math f32 on device; only per-chunk scalar sums come back.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.rwkv4 import RWKVParams, forward_seq, init_state


import functools


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _chunk_nll(params: RWKVParams, tokens: jax.Array, targets: jax.Array,
               length: jax.Array, state, compute_dtype=jnp.float32):
    """Sum of -log p(target) over one chunk. tokens/targets: [T] (padded);
    positions >= length are no-ops for both the NLL sum and the state."""
    logits, state = forward_seq(
        params, tokens, state, parallel=True, return_all_logits=True,
        length=length, compute_dtype=compute_dtype,
    )
    mask = (jnp.arange(tokens.shape[0]) < length).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return -jnp.sum(tgt * mask), jnp.sum(mask), state


def evaluate_nll(
    params: RWKVParams,
    token_ids: np.ndarray,
    *,
    chunk: int = 256,
    compute_dtype=jnp.float32,
) -> dict:
    """Mean NLL / perplexity of `token_ids` under the model.

    Predicts token_ids[t+1] from token_ids[:t+1] (standard LM eval).
    compute_dtype=jnp.bfloat16 evaluates the fast-prefill numerics.
    """
    ids = np.asarray(token_ids, np.int32)
    if ids.size < 2:
        raise ValueError("need at least 2 tokens")
    inputs = ids[:-1]
    targets = ids[1:]
    n = inputs.size

    state = init_state(params.config)
    total_nll = 0.0
    total_cnt = 0.0
    for i in range(0, n, chunk):
        part_in = inputs[i : i + chunk]
        part_tg = targets[i : i + chunk]
        valid = part_in.size
        if valid < chunk:
            part_in = np.pad(part_in, (0, chunk - valid))
            part_tg = np.pad(part_tg, (0, chunk - valid))
        nll, cnt, state = _chunk_nll(
            params, jnp.asarray(part_in), jnp.asarray(part_tg),
            jnp.asarray(valid, jnp.int32), state,
            compute_dtype=compute_dtype,
        )
        total_nll += float(nll)
        total_cnt += float(cnt)

    mean_nll = total_nll / total_cnt
    return {
        "tokens": int(total_cnt),
        "nll": mean_nll,
        "ppl": math.exp(mean_nll),
        "bits_per_token": mean_nll / math.log(2),
    }


def compare_quantization(
    dense_params: RWKVParams,
    quant_params: RWKVParams,
    token_ids: np.ndarray,
    *,
    chunk: int = 256,
) -> dict:
    """The headline quality metric: ppl(quantized) - ppl(dense)."""
    d = evaluate_nll(dense_params, token_ids, chunk=chunk)
    q = evaluate_nll(quant_params, token_ids, chunk=chunk)
    return {
        "dense_ppl": d["ppl"],
        "quant_ppl": q["ppl"],
        "ppl_delta": q["ppl"] - d["ppl"],
        "nll_delta": q["nll"] - d["nll"],
        "tokens": d["tokens"],
    }
