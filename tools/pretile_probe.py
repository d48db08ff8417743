"""Isolate the TP-kernel pretile inversion (round-2 anomaly — RESOLVED).

RESOLUTION (round 3, after this probe ran): the "inversion" was a TILE
effect, not a layout effect — the round-2 4-D run was effectively
measuring a full-width-tile config, which loses 23-30% at E=1024 at any
batch. At matched tile the layouts are within noise (this probe's
result), and at batch the 4-D layout WINS (+6% B=8, +4% B=16, only
VMEM-safe t=512 at B=32). See BENCH_NOTES "Round-3 findings". The probe
is kept for the methodology: it factorizes layout x grid-spec.

Measured in round 2: the contiguous-block weight layout (pretile_params,
[L, E, O] -> [L, O/t, E, t]) gains +0.5-3% in the single-chip decode stack
but LOSES ~20% in the TP fused kernel (decode_stack_tp) at 430M/tile=512 —
with tools/layout_probe.py exculpating the memory system (pure-DMA rates:
pretiled 759 GB/s > strided 722 GB/s). Remaining suspects: (a) Mosaic
pipelining of rank-4 windows, (b) the PrefetchScalarGridSpec used for the
fused embedding gather (the single-chip kernel also uses scalar prefetch,
but with DIFFERENT index-map arity).

This probe factorizes the two: it times decode_stack_tp at tp=1 over
  {3-D strided, 4-D pretiled} x {fuse_embed on (scalar-prefetch grid),
                                 fuse_embed off (plain grid)}
with identical tile and weights. If the inversion persists with
fuse_embed=False (plain grid=), the scalar-prefetch hypothesis is dead and
rank-4 windows are the mechanism; if it vanishes, PrefetchScalarGridSpec x
rank-4 interaction is confirmed.

Timing: two-length lax.scan slope (see bench.py — the tunneled device has
a ~30 ms dispatch floor and a no-op block_until_ready).

Env knobs: RWKV_TPU_BENCH_MODEL (default 430m), RWKV_TPU_BENCH_TILE
(default 512), RWKV_TPU_BENCH_STEPS (default 128).
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/rwkv_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from rwkv_tpu.models.config import RWKVConfig  # noqa: E402
from rwkv_tpu.models.rwkv4 import (  # noqa: E402
    init_state,
    random_quantized_params_device,
    signedize_params,
)
from rwkv_tpu.ops.layernorm import layer_norm  # noqa: E402
from rwkv_tpu.ops.pallas.decode_stack_tp import decode_stack_tp  # noqa: E402


def time_variant(cfg, params, *, tile, fuse_embed, steps):
    state = init_state(cfg, (1,))  # leaves [L, B=1, E]

    def step(params, tok, st):
        tokb = tok[None]  # [1]
        if fuse_embed:
            x = None
        else:
            x = layer_norm(params.emb[tokb].astype(jnp.float32),
                           params.ln0.weight, params.ln0.bias)
        logits_loc, st = decode_stack_tp(
            x, params, st, params.att.decay, params.att.bonus,
            tp=1, token=tokb if fuse_embed else None, fuse_embed=fuse_embed,
            tile=tile, data_axis=None,
        )
        return logits_loc + params.logit_bias, st

    def make(n):
        def run(params, tok, st):
            def body(carry, _):
                t, s = carry
                lg, s = step(params, t, s)
                return (jnp.argmax(lg[0]).astype(jnp.int32), s), ()
            (t, s), _ = jax.lax.scan(body, (tok, st), None, length=n)
            return t, s
        return jax.jit(run)

    r1, r2 = make(steps), make(2 * steps)
    tok = jnp.asarray(187, jnp.int32)
    t0 = time.perf_counter()
    np.asarray(r1(params, tok, state)[0])
    compile_s = time.perf_counter() - t0
    np.asarray(r2(params, tok, state)[0])
    b1 = b2 = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(r1(params, tok, state)[0])
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(r2(params, tok, state)[0])
        b2 = min(b2, time.perf_counter() - t0)
    per = max(b2 - b1, 1e-9) / steps
    return 1.0 / per, compile_s


def main():
    name = os.environ.get("RWKV_TPU_BENCH_MODEL", "430m")
    tile = int(os.environ.get("RWKV_TPU_BENCH_TILE", "512"))
    steps = int(os.environ.get("RWKV_TPU_BENCH_STEPS", "128"))
    cfg = getattr(RWKVConfig, f"rwkv4_{name}")()

    out = {}
    for pretile in (False, True):
        params = random_quantized_params_device(
            cfg, seed=0, pretile=(tile if pretile else None))
        params = signedize_params(params)
        for fe in (True, False):
            key = f"{'4d' if pretile else '3d'}_{'prefetch' if fe else 'plain'}"
            tok_s, compile_s = time_variant(
                cfg, params, tile=tile, fuse_embed=fe, steps=steps)
            out[key] = round(tok_s, 1)
            print(f"# {key}: {tok_s:.1f} tok/s (compile {compile_s:.0f}s)",
                  flush=True)
        del params

    inv_prefetch = out["3d_prefetch"] / out["4d_prefetch"]
    inv_plain = out["3d_plain"] / out["4d_plain"]
    print(json.dumps({
        "metric": f"pretile_probe_{name}_tile{tile}",
        "tok_s": out,
        "inversion_with_prefetch": round(inv_prefetch, 3),
        "inversion_plain_grid": round(inv_plain, 3),
        "verdict": ("scalar-prefetch x rank-4 interaction"
                    if inv_plain < 1.05 <= inv_prefetch
                    else "rank-4 windows themselves"
                    if inv_plain >= 1.05
                    else "no inversion reproduced"),
    }))


if __name__ == "__main__":
    main()
