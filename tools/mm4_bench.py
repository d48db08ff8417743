"""Microbench: Pallas mm4 (4-bit weights) vs mm8, on the live chip.

The decode roofline is weight HBM bytes/token; mm4 halves them. This
measures whether the in-register nibble unpack keeps the kernel on the
DMA roofline (i.e. ~2x mm8 tokens/s) or becomes VPU-bound.
Usage: python tools/mm4_bench.py [K] [O] [B] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.ops.pallas.mm4 import mm4
from rwkv_tpu.ops.pallas.mm8 import mm8


def bench(fn, args, iters, label, bytes_per_call, spread_s=0.25):
    """Two-length slope timing, auto-calibrated: the (n2-n1) extra device
    work must dwarf the tunnel's per-dispatch jitter (~ms on a ~30 ms
    floor), or the slope degenerates — at E=1024 B=1 shapes (0.5-20 us
    kernels) fixed iters=64 measured NEGATIVE us/call (BENCH_NOTES
    round-5). Calibrate n so (n2-n1)*per_call >= spread_s."""
    xs0, w = args

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

    def slope(n1, n2, reps=3):
        f1, f2 = make(n1), make(n2)
        np.asarray(f1(xs0, w)[0, 0])
        np.asarray(f2(xs0, w)[0, 0])
        b1 = b2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f1(xs0, w)[0, 0])
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(xs0, w)[0, 0])
            b2 = min(b2, time.perf_counter() - t0)
        return (b2 - b1) / (n2 - n1)

    # Pilot at the requested iters, then scale the length pair so the
    # extra work spans spread_s of device time (cap the scan length).
    # The pilot slope can itself be jitter (even negative), so iterate:
    # after each calibrated measurement, verify the ACHIEVED spread
    # (3*n1*per_call) actually cleared spread_s and re-scale if not —
    # a noise-dominated pilot magnitude badly misestimates the rate.
    per_call = slope(iters, iters * 4, reps=2)
    n1 = iters
    for _ in range(4):
        if per_call > 0 and 3 * n1 * per_call >= spread_s * 0.8:
            break  # achieved spread genuinely cleared the target
        est = max(abs(per_call), 1e-7)  # degenerate -> assume 0.1 us
        want = min(max(iters, int(spread_s / 3.0 / est)), 200_000)
        if want <= n1:
            if n1 >= 200_000:
                break  # at the cap; report what we have
            want = min(n1 * 4, 200_000)  # estimate lies low — push harder
        n1 = want
        # guard: one timed f(n1) call corrects an estimate that
        # undershot badly (a too-big n1 would blow the step timeout).
        f1 = make(n1)
        np.asarray(f1(xs0, w)[0, 0])
        t0 = time.perf_counter()
        np.asarray(f1(xs0, w)[0, 0])
        w1 = time.perf_counter() - t0
        if w1 > 3.0:
            n1 = max(iters, int(n1 * 1.0 / w1))
        per_call = slope(n1, n1 * 4)
    if n1 == iters:
        # calibration never engaged (big shapes): keep the old best-of-3
        # confidence rather than publishing the reps=2 pilot.
        per_call = slope(iters, iters * 4, reps=3)
    gbps = bytes_per_call / per_call / 1e9
    print(f"{label:26s}: {per_call*1e6:8.2f} us/call  {gbps:7.1f} GB/s "
          f"effective  (n={n1})", flush=True)
    return per_call


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    O = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    w8 = jnp.asarray(rng.integers(-128, 128, size=(K, O), dtype=np.int8))
    w4 = jnp.asarray(rng.integers(-128, 128, size=(K // 2, O),
                                  dtype=np.int8))
    print(f"shapes: xs[{B},{K}] @ w[{K},{O}]  "
          f"(u8 {K*O/1e6:.1f} MB, packed4 {K*O/2e6:.1f} MB)")

    base8 = None
    for tile in (256, 512, 1024):
        if tile <= O:
            t8 = bench(lambda a, b, t=tile: mm8(a, b, tile_o=t, lhs_bf16=True),
                       (xs, w8), iters, f"pallas mm8 bf16 t{tile}", K * O)
            base8 = min(base8 or t8, t8)
    best4 = None
    for variant in ("unpack", "two_dot"):
        for tile in (128, 256, 512, 1024):
            if tile <= O:
                t4 = bench(
                    lambda a, b, t=tile, v=variant: mm4(a, b, tile_o=t,
                                                        variant=v),
                    (xs, w4), iters, f"pallas mm4/{variant} t{tile}",
                    K * O // 2)
                best4 = min(best4 or t4, t4)
    if base8 and best4:
        print(f"mm4 speedup over mm8: {base8 / best4:.2f}x "
              f"(roofline target ~2x)")


if __name__ == "__main__":
    main()
