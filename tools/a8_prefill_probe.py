"""Is W8A8 prefill worth it? Raw MXU rate probe at prefill GEMM shapes.

Prefill is MXU-compute-bound (BENCH_NOTES: 430M bf16 prefill = 133k tok/s
at the bf16 roofline). The v5e int8 MXU is nominally 2x the bf16 rate
(394 TOPS vs 197 TFLOPS), so an s8 x s8 -> s32 prefill GEMM path
(activations dynamically quantized per row, weights already s8) could
~double prompt ingest. Decode does NOT care (HBM-bound; a8 measured a
dead end there — BENCH_NOTES 'Kernel findings').

This probe times the three GEMMs of one 430M-scale block at T=1024
(bf16 x bf16 -> f32 vs s8 x s8 -> s32, XLA native dots) and prints the
ratio. Slope timing over two scan lengths (tunnel methodology).
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

T = int(os.environ.get("PROBE_T", "1024"))
E = int(os.environ.get("PROBE_E", "1024"))
REPS = 5


def run(dtype_in, acc, n):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    if dtype_in == jnp.int8:
        x = jax.random.randint(k1, (T, E), -127, 127, jnp.int8)
        w1 = jax.random.randint(k2, (E, 4 * E), -127, 127, jnp.int8)
        w2 = jax.random.randint(k3, (4 * E, E), -127, 127, jnp.int8)
    else:
        x = jax.random.normal(k1, (T, E), dtype_in)
        w1 = jax.random.normal(k2, (E, 4 * E), dtype_in)
        w2 = jax.random.normal(k3, (4 * E, E), dtype_in)

    def chain(x, w1, w2, n):
        def body(h, _):
            a = jax.lax.dot(h, w1, preferred_element_type=acc)
            # re-narrow so the chain stays in the input dtype
            a = a.astype(dtype_in) if dtype_in != jnp.int8 else (
                (a >> 8).astype(jnp.int8))
            b = jax.lax.dot(a, w2, preferred_element_type=acc)
            b = b.astype(dtype_in) if dtype_in != jnp.int8 else (
                (b >> 8).astype(jnp.int8))
            return b, ()
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    f = jax.jit(functools.partial(chain, n=n))
    out = f(x, w1, w2)
    np.asarray(out)          # sync (block_until_ready is a no-op on axon)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f(x, w1, w2))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    flops_per_iter = 2 * T * E * 4 * E * 2   # two GEMMs
    out = {}
    for name, (dt, acc) in {
        "bf16": (jnp.bfloat16, jnp.float32),
        "s8": (jnp.int8, jnp.int32),
    }.items():
        b1 = run(dt, acc, 256)
        b2 = run(dt, acc, 512)
        per_iter = max(b2 - b1, 1e-9) / 256
        tflops = flops_per_iter / per_iter / 1e12
        out[name] = round(tflops, 1)
        print(f"# {name}: {tflops:.1f} T(FL)OPS/s ({per_iter*1e3:.3f} ms/iter)",
              flush=True)
    print(json.dumps({
        "metric": "a8_vs_bf16_prefill_gemm_tflops",
        "T": T, "E": E, "tflops": out,
        "s8_speedup": round(out["s8"] / out["bf16"], 2),
    }))


if __name__ == "__main__":
    main()
