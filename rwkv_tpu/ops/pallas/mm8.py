"""Pallas TPU kernel: u8 weight matmul with in-register dequantization.

The hot op of quantized decode. Math (see ops/quant.py): with per-input-
channel scale r and offset o,

    y = x @ (W8 * r[:,None] + o[:,None])  =  (x*r) @ W8  +  (x.o)

The kernel computes `(x*r) @ W8` with the u8 tile widened in-register —
u8 → bf16 is exact (all of 0..255 representable) — so HBM traffic stays
1 byte/weight, the same fusion the reference does scalar-wise in CUDA
(include/rwkv/cuda/rwkv.cu:290). The rank-1 offset term and the x*r
pre-scale are left to XLA (elementwise, fused for free).

Grid: 1-D over output tiles; the full contraction dim stays resident in
VMEM (decode shapes: E<=5120 -> xs tile <=1.3MB, w tile <=2.6MB at
TILE_O=512). Pallas double-buffers the weight tiles across grid steps
automatically, overlapping the HBM stream with the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm8_kernel(xs_ref, w_ref, out_ref, *, acc_dtype):
    w = w_ref[:].astype(jnp.bfloat16)  # exact i8 widening (|w| <= 128)
    out_ref[:] = jnp.dot(
        xs_ref[:].astype(jnp.bfloat16),
        w,
        preferred_element_type=acc_dtype,
    ).astype(out_ref.dtype)


def _mm8_kernel_f32(xs_ref, w_ref, out_ref, *, acc_dtype):
    # float32 lhs path: xs stays f32 (Mosaic uses multi-pass bf16 MXU);
    # still HBM-bound at decode batch sizes, so the extra passes are free.
    w = w_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.dot(
        xs_ref[:], w, preferred_element_type=acc_dtype
    ).astype(out_ref.dtype)


def _as_i8(w: jax.Array) -> jax.Array:
    """Mosaic has no u8->float cast; weights must arrive as int8
    (ops.quant.to_signed re-centers storage at load time)."""
    if w.dtype == jnp.int8:
        return w
    raise TypeError(
        f"mm8 requires int8 weights (got {w.dtype}); apply "
        "rwkv_tpu.ops.quant.to_signed at load time"
    )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit,
                   static_argnames=("tile_o", "lhs_bf16", "interpret", "vma"))
def mm8(
    xs: jax.Array,        # [B, K] float32 — already scaled by r
    w: jax.Array,         # [K, O] int8 (ops.quant.to_signed)
    *,
    tile_o: int = 512,
    lhs_bf16: bool = False,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> jax.Array:
    """(xs @ w_u8) with fused dequant-widening. Returns [B, O] float32.

    vma: varying-manual-axes of the output when called inside a check_vma
    shard_map (the TP head matvec, parallel/tp_step.py)."""
    B, K = xs.shape
    K2, O = w.shape
    assert K == K2, (xs.shape, w.shape)
    w = _as_i8(w)

    # sublane-pad the batch dim (f32 min tile is 8x128)
    Bp = _round_up(max(B, 8), 8)
    if Bp != B:
        xs = jnp.pad(xs, ((0, Bp - B), (0, 0)))

    tile_o = min(tile_o, _round_up(O, 128))
    Op = _round_up(O, tile_o)
    if Op != O:
        w = jnp.pad(w, ((0, 0), (0, Op - O)))

    kernel = functools.partial(
        _mm8_kernel if lhs_bf16 else _mm8_kernel_f32, acc_dtype=jnp.float32
    )
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(Op // tile_o,),
        in_specs=[
            pl.BlockSpec((Bp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_o), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bp, tile_o), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.float32, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * Op,
            bytes_accessed=K * Op + Bp * K * 4 + Bp * Op * 4,
            transcendentals=0,
        ),
    )(xs, w)
    return out[:B, :O]


def qmatmul_pallas(x: jax.Array, q, *, tile_o: int = 512, lhs_bf16: bool = False,
                   interpret: bool = False):
    """Drop-in for ops.quant.qmatmul using the Pallas kernel.

    x: [..., K]; q: QuantLinear with w [K, O]. Returns [..., O] f32.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    xb = x.reshape((-1, K))
    xs = xb * q.scale
    main = mm8(xs, q.w, tile_o=tile_o, lhs_bf16=lhs_bf16, interpret=interpret)
    off = (xb @ q.offset)[:, None]
    return (main + off).reshape(lead + (q.w.shape[-1],))


def _mm8_a8_kernel(x8_ref, w_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        x8_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("tile_o", "interpret"))
def mm8_a8(
    xs: jax.Array,        # [B, K] float32 — already scaled by r
    w: jax.Array,         # [K, O] int8
    *,
    tile_o: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """W8A8 path: dynamic symmetric int8 activation quantization + native
    s8 x s8 -> s32 MXU matmul (no dequant-widening pass at all).

    ~1.9x faster than the widening path on v5e (the u8->float convert is
    VPU-bound at ~0.5e12 elem/s, below the HBM stream rate). Adds ~0.4%
    relative activation-quant noise — use where that is below the weight
    quantization floor (e.g. the logits head).
    """
    B, K = xs.shape
    K2, O = w.shape
    assert K == K2
    w = _as_i8(w)

    # per-row dynamic scale: xs ~= sx * x8
    sx = jnp.max(jnp.abs(xs), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-30)
    x8 = jnp.clip(jnp.round(xs / sx), -127, 127).astype(jnp.int8)

    Bp = _round_up(max(B, 8), 8)
    if Bp != B:
        x8 = jnp.pad(x8, ((0, Bp - B), (0, 0)))
    tile_o = min(tile_o, _round_up(O, 128))
    Op = _round_up(O, tile_o)
    if Op != O:
        w = jnp.pad(w, ((0, 0), (0, Op - O)))

    acc = pl.pallas_call(
        _mm8_a8_kernel,
        interpret=interpret,
        grid=(Op // tile_o,),
        in_specs=[
            pl.BlockSpec((Bp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_o), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bp, tile_o), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * Op,
            bytes_accessed=K * Op + Bp * K + Bp * Op * 4,
            transcendentals=0,
        ),
    )(x8, w)
    return acc[:B, :O].astype(jnp.float32) * sx
