"""Isolated DMA probe: strided col-blocks vs pretiled contiguous blocks.

Motivated by a measured inversion (BENCH_NOTES "Pretile anomaly"): the
contiguous-block weight layout that gains +0.5-3% in the single-chip
decode kernel made the TP fused kernel 20% SLOWER at 430M. This probe
streams the SAME bytes through a do-almost-nothing kernel in both
layouts, isolating pure DMA behavior from the kernels' compute/schedule:

  strided : w3 [L, E, O]        blocks (1, E, tile)    at (l, 0, j)
            (each block = E rows of `tile` bytes, stride O)
  pretiled: w4 [L, O/t, E, t]   blocks (1, 1, E, tile) at (l, j, 0, 0)
            (each block = one contiguous E*tile run)

Usage: python tools/layout_probe.py [E] [O] [tile] [L]
Prints GB/s for each layout via two-length slope timing.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _k3(c_ref, w_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = c_ref[...]

    o_ref[0, :] += w_ref[0, 0, :128].astype(jnp.float32)


def _k4(c_ref, w_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = c_ref[...]

    o_ref[0, :] += w_ref[0, 0, 0, :128].astype(jnp.float32)


def make_stream(layout, L, E, O, tile, n_sweeps):
    """ONE jit: n_sweeps full passes over the array (lax.fori threading the
    carry so sweeps cannot be CSE'd), enough traffic to dwarf the tunnel's
    fixed dispatch cost."""
    nt = O // tile

    def index3(i):
        return (i // nt, 0, i % nt)

    def index4(i):
        return (i // nt, i % nt, 0, 0)

    def sweep(carry, w):
        if layout == "strided":
            spec = pl.BlockSpec((1, E, tile), index3,
                                memory_space=pltpu.VMEM)
            kern = _k3
        else:
            spec = pl.BlockSpec((1, 1, E, tile), index4,
                                memory_space=pltpu.VMEM)
            kern = _k4
        return pl.pallas_call(
            kern,
            grid=(L * nt,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                spec,
            ],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(carry, w)

    def run(carry, w):
        return jax.lax.fori_loop(0, n_sweeps, lambda i, c: sweep(c, w),
                                 carry)

    return jax.jit(run)


def measure(layout, L, E, O, tile, reps=5, target_gb=4.0):
    key = jax.random.PRNGKey(0)
    if layout == "strided":
        w = jax.random.randint(key, (L, E, O), -128, 128, dtype=jnp.int8)
    else:
        w = jax.random.randint(key, (L, O // tile, E, tile), -128, 128,
                               dtype=jnp.int8)
    bytes_sweep = L * E * O
    R = max(1, int(target_gb * 1e9 / bytes_sweep))
    carry = jnp.zeros((1, 128), jnp.float32)
    r1 = make_stream(layout, L, E, O, tile, R)
    r2 = make_stream(layout, L, E, O, tile, 2 * R)

    np.asarray(r1(carry, w))
    np.asarray(r2(carry, w))
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(r1(carry, w))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(r2(carry, w))
        b2 = min(b2, time.perf_counter() - t0)
    gbs = R * bytes_sweep / max(b2 - b1, 1e-9) / 1e9
    return gbs


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    O = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    for layout in ("strided", "pretiled"):
        gbs = measure(layout, L, E, O, tile)
        print(f"{layout:9s} E={E} O={O} tile={tile} L={L}: {gbs:7.1f} GB/s")


if __name__ == "__main__":
    main()
