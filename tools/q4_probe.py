"""int4-weight feasibility probe (round 4): is W4 decode ~2x W8 on TPU?

Decode is weight-HBM-bound (BENCH_NOTES: 7B/14B at ~100% of the measured
DMA ceiling), so halving weight bytes/token with 4-bit weights is the one
remaining big decode win over the reference's Q8_0-only scheme. Two
questions this probe answers on the real chip, cheaply, before any
framework work:

  1. XLA path: does `x @ W.astype(bf16)` with W stored as jnp.int4 (XLA
     s4 — packed 2/byte) actually stream half the HBM bytes of int8, or
     does XLA materialize an unpacked copy? Measured as per-call slope
     time of a big matvec at several sizes.
  2. Pallas path: does Mosaic accept an int4 VMEM block (load + widen +
     dot in-kernel), or do the kernels need manual packed-uint8 nibble
     unpacking (split-half layout, no interleave)? Tried both; reports
     which compiles and its measured time.

Env: PROBE_E (8192), PROBE_REPS (6).
"""

import functools as ft
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps):
    np.asarray(fn())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn1, fn2, reps):
    """fn2 does 2x the work of fn1; slope removes the dispatch floor."""
    return max(timeit(fn2, reps) - timeit(fn1, reps), 1e-9)


def _mk_w(shape, dt):
    # jnp.zeros(..., int4) hits a client-side RecursionError on the axon
    # plugin; int8 -> astype(int4) on device works (measured 2026-08-17).
    if dt == jnp.int4:
        return jax.jit(lambda x: x.astype(jnp.int4))(jnp.ones(shape, jnp.int8))
    return jnp.ones(shape, dt)


def xla_matvec_probe(E, reps):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, E), jnp.bfloat16)
    out = {}
    for name, dt in (("int8", jnp.int8), ("int4", jnp.int4)):
        try:
            w1 = _mk_w((E, E), dt)
            w2 = _mk_w((E, 2 * E), dt)

            @jax.jit
            def mv(x, w):
                return (x @ w.astype(jnp.bfloat16)).sum()

            f1 = ft.partial(mv, x, w1)
            f2 = ft.partial(mv, x, w2)
            dt_s = slope(f1, f2, reps)  # time for ONE extra ExE matvec
            bytes_ = E * E * (1 if name == "int8" else 0.5)
            out[name] = {"s_per_matvec": round(dt_s, 6),
                         "GBps": round(bytes_ / dt_s / 1e9, 1)}
        except Exception as e:  # noqa: BLE001 — report, keep probing
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return out


def pallas_int4_probe(E, reps):
    """Mosaic int4 block: load [E,128] int4, widen, matvec vs bf16 x."""
    from jax.experimental import pallas as pl

    def kern(x_ref, w_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(x_ref[...], w,
                             preferred_element_type=jnp.float32)

    out = {}
    for name, dt in (("int8", jnp.int8), ("int4", jnp.int4)):
        try:
            x = jnp.ones((1, E), jnp.bfloat16)

            def run(n_out, dt=dt):
                w = _mk_w((E, n_out), dt)
                f = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((1, n_out), jnp.float32),
                    grid=(n_out // 128,),
                    in_specs=[
                        pl.BlockSpec((1, E), lambda i: (0, 0)),
                        pl.BlockSpec((E, 128), lambda i: (0, i)),
                    ],
                    out_specs=pl.BlockSpec((1, 128), lambda i: (0, i)),
                )
                return jax.jit(lambda x: f(x, w))

            f1, f2 = run(1024), run(2048)
            dt_s = slope(lambda: f1(x), lambda: f2(x), reps)
            bytes_ = E * 1024 * (1 if name == "int8" else 0.5)
            out[name] = {"s_per_1024cols": round(dt_s, 6),
                         "GBps": round(bytes_ / dt_s / 1e9, 1)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
    return out


def pallas_packed_u8_probe(E, reps):
    """Manual split-half nibble unpack in-kernel: packed [E/2,128] uint8
    -> int8 [E,128] -> bf16 dot. The fallback if native int4 is rejected."""
    from jax.experimental import pallas as pl

    def kern(x_ref, w_ref, o_ref):
        # int8 >> crashes the Mosaic compiler (remote HTTP 500, measured
        # 2026-08-17); widen to int32 for the bit ops, then narrow.
        p = w_ref[...].astype(jnp.int32)     # [E/2, 128] nibble-packed
        lo = (p & 0xF) - 8                   # rows [0, E/2), signed
        hi = ((p >> 4) & 0xF) - 8            # rows [E/2, E)
        w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(x_ref[...], w,
                             preferred_element_type=jnp.float32)

    try:
        x = jnp.ones((1, E), jnp.bfloat16)

        def run(n_out):
            w = jnp.ones((E // 2, n_out), jnp.int8)
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, n_out), jnp.float32),
                grid=(n_out // 128,),
                in_specs=[
                    pl.BlockSpec((1, E), lambda i: (0, 0)),
                    pl.BlockSpec((E // 2, 128), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, i)),
            )
            return jax.jit(lambda x: f(x, w))

        f1, f2 = run(1024), run(2048)
        dt_s = slope(lambda: f1(x), lambda: f2(x), reps)
        bytes_ = (E // 2) * 1024
        return {"s_per_1024cols": round(dt_s, 6),
                "GBps_packed": round(bytes_ / dt_s / 1e9, 1)}
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def main():
    E = int(os.environ.get("PROBE_E", "8192"))
    reps = int(os.environ.get("PROBE_REPS", "6"))
    out = {"probe": "q4_feasibility", "E": E,
           "backend": jax.default_backend()}
    out["xla_matvec"] = xla_matvec_probe(E, reps)
    out["pallas_block"] = pallas_int4_probe(E, reps)
    out["pallas_packed_u8"] = pallas_packed_u8_probe(E, reps)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
