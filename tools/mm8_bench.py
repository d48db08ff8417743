"""Microbench: Pallas mm8 vs XLA fused-convert dot, on the live chip.

Measures effective HBM bandwidth of the u8 matvec at decode shapes.
Usage: python tools/mm8_bench.py [K] [O] [B] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.ops.pallas.mm8 import mm8


def bench(fn, args, iters, label, bytes_per_call):
    xs0, w = args
    m = min(xs0.shape[1], None or 10**9)

    # Two-point slope: the tunneled device has a ~30ms fixed dispatch+sync
    # floor, so absolute timings are meaningless — time N and 4N iterations
    # and use the difference.
    def make(n):
        @jax.jit
        def many_n(xs, w):
            def body(carry, _):
                o = fn(carry, w)
                k = min(carry.shape[1], o.shape[1])
                carry = carry.at[:, :k].add(o[:, :k] * 1e-30)
                return carry, ()

            xs, _ = jax.lax.scan(body, xs, None, length=n)
            return xs

        return many_n

    n1, n2 = iters, iters * 4
    f1, f2 = make(n1), make(n2)
    np.asarray(f1(xs0, w)[0, 0])
    np.asarray(f2(xs0, w)[0, 0])
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f1(xs0, w)[0, 0])
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(xs0, w)[0, 0])
        b2 = min(b2, time.perf_counter() - t0)
    per_call = (b2 - b1) / (n2 - n1)
    gbps = bytes_per_call / per_call / 1e9
    print(f"{label:24s}: {per_call*1e6:8.2f} us/call  {gbps:7.1f} GB/s effective")
    return per_call


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    O = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray(rng.integers(-128, 128, size=(K, O), dtype=np.int8))
    nbytes = K * O  # dominant traffic

    print(f"shapes: xs[{B},{K}] @ w_u8[{K},{O}]  ({nbytes/1e6:.1f} MB weights)")

    def xla_dot(xs, w):
        return jax.lax.dot_general(
            xs, w.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def xla_dot_bf16(xs, w):
        return jax.lax.dot_general(
            xs.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    bench(xla_dot, (xs, w), iters, "xla f32-convert dot", nbytes)
    bench(xla_dot_bf16, (xs, w), iters, "xla bf16-convert dot", nbytes)
    for tile in (256, 512, 1024):
        if tile <= O:
            bench(lambda a, b, t=tile: mm8(a, b, tile_o=t), (xs, w), iters,
                  f"pallas mm8 f32 t{tile}", nbytes)
            bench(lambda a, b, t=tile: mm8(a, b, tile_o=t, lhs_bf16=True),
                  (xs, w), iters, f"pallas mm8 bf16 t{tile}", nbytes)


if __name__ == "__main__":
    main()
