"""Pure HBM streaming probe: what does THIS chip actually sustain?

A Pallas kernel whose grid steps each DMA one contiguous block HBM->VMEM
and do (almost) nothing with it — upper-bounding any weight-streaming
kernel. Slope timing over two grid lengths cancels the tunnel's fixed
dispatch cost, exactly like bench.py.

Motivation: decode benches report >100% of the v5e's *nominal* 819 GB/s
at small models; this probe measures the real ceiling so those numbers
can be sanity-checked against hardware rather than a datasheet constant.

Usage: python tools/hbm_probe.py [block_kb] [n_blocks]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(c_ref, x_ref, o_ref):
    # touch one vector so the block load cannot be elided; the DMA of the
    # whole block happens regardless (pallas copies blocks into VMEM).
    # The carry input threads a data dependency between repetitions so XLA
    # cannot CSE identical sweeps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = c_ref[...]

    o_ref[0, :] += x_ref[0, 0, :128].astype(jnp.float32)


def stream(carry, data, n_blocks, block_rows, block_cols, interpret=False):
    return pl.pallas_call(
        _probe_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, block_cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )(carry, data)


def main():
    block_kb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rows = 8
    cols = block_kb * 1024 // rows
    # content is irrelevant to DMA rate; zeros avoids a 4x randint blowup
    data = jax.jit(lambda: jnp.zeros((n_blocks, rows, cols), jnp.int8))()
    bytes_total = data.nbytes

    def sweeps(d, r):
        def body(c, _):
            return stream(c, d, n_blocks, rows, cols), None
        c, _ = jax.lax.scan(body, jnp.zeros((1, 128), jnp.float32), None,
                            length=r)
        return c

    R = max(1, int(24e9 // bytes_total))  # ~24 GB of traffic for run1
    run1 = jax.jit(lambda d: sweeps(d, 2 * R))
    run2 = jax.jit(lambda d: sweeps(d, R))
    np.asarray(run1(data))  # compile + warm
    np.asarray(run2(data))

    b1 = b2 = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(run1(data))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run2(data))
        b2 = min(b2, time.perf_counter() - t0)
    dt = max(b1 - b2, 1e-9)
    gbs = (bytes_total * R) / dt / 1e9
    print(f"block={block_kb}KB x {n_blocks} blocks: "
          f"sustained {gbs:.0f} GB/s (slope over {bytes_total*R/1e9:.1f} GB)")


if __name__ == "__main__":
    main()
