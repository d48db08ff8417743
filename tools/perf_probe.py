"""Decode-path perf experiments on the live chip.

Usage: python tools/perf_probe.py [430m] [steps]
Compares layer-iteration strategies for the decode step:
  scan     — lax.scan over stacked layer params (current forward_step)
  unroll   — python loop with static slices of the stacked params
  split    — python loop over per-layer param pytrees (no slicing at all)
Reports tokens/s for each. Sync is via host readback (axon platform's
block_until_ready is unreliable — see bench.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    WKVState,
    _att_step,
    _ffn_step,
    _layer_slice,
    forward_step,
    init_state,
    random_quantized_params_np,
)
from rwkv_tpu.ops.layernorm import layer_norm
from rwkv_tpu.ops.quant import qmatmul
from rwkv_tpu.ops.wkv import WKVChannelState


def forward_step_unrolled(params, token, state):
    x = params.emb[token].astype(jnp.float32)
    x = layer_norm(x, params.ln0.weight, params.ln0.bias)
    L = params.n_layer
    outs = []
    for i in range(L):
        (ln1, ln2, att, ffn) = _layer_slice(params, i)
        xy, aa, bb, pp, dd = (s[i] for s in state)
        x, xy, chan = _att_step(x, att, ln1, xy, WKVChannelState(aa, bb, pp))
        x, dd = _ffn_step(x, ffn, ln2, dd)
        outs.append(WKVState(xy, chan.aa, chan.bb, chan.pp, dd))
    new_state = WKVState(*(jnp.stack(leaves) for leaves in zip(*outs)))
    x = layer_norm(x, params.ln_out.weight, params.ln_out.bias)
    logits = qmatmul(x, params.head)
    if params.logit_bias is not None:
        logits = logits + params.logit_bias
    return logits, new_state


def time_fn(fn, params, state, steps, reps=3):
    def decode_k(params, token, state):
        def body(carry, _):
            tok, st = carry
            logits, st = fn(params, tok, st)
            nxt = jnp.argmax(logits).astype(jnp.int32)
            return (nxt, st), nxt

        (tok, st), toks = jax.lax.scan(body, (token, state), None, length=steps)
        return tok, toks

    run = jax.jit(decode_k)
    tok = jnp.asarray(187, jnp.int32)
    t0 = time.perf_counter()
    o, toks = run(params, tok, state)
    np.asarray(o)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o, toks = run(params, tok, state)
        np.asarray(o)
        best = min(best, time.perf_counter() - t0)
    return steps / best, compile_s


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "430m"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = getattr(RWKVConfig, f"rwkv4_{name}")()
    params = random_quantized_params_np(cfg)
    state = init_state(cfg)

    for label, fn in [("scan", forward_step), ("unroll", forward_step_unrolled)]:
        tps, cs = time_fn(fn, params, state, steps)
        print(f"{label:8s}: {tps:9.1f} tok/s   (compile {cs:.1f}s)")


if __name__ == "__main__":
    main()
