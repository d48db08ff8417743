"""Pallas TPU kernel: 4-bit weight matmul with in-register nibble unpack.

Decode is weight-HBM-bound (BENCH_NOTES: 7B/14B at ~100% of the measured
DMA ceiling with u8 weights), so 4-bit weights halve bytes/token — the one
remaining big decode win over the reference's Q8_0-only scheme
(converter/convert_model.py:108-119 quantizes to u8; no 4-bit path exists
in the reference).

Packing (ops.quant.quantize4): two 4-bit codes per int8 byte, SPLIT-HALF
along the contraction dim so the unpack needs no interleave:

    byte[j, o] = (signed4(q[j + K/2, o] - 8) << 4) | q[j, o]     j < K/2

Unpack trick — Mosaic has no int8 shift (the remote compiler crashes on
`int8 >> 4`, measured 2026-08-17), but int8 `&` and `-` lower fine:

    lo  = (p & 0xF) - 8            # rows [0, K/2),  in [-8, 7]
    hi  = p - (p & 0xF)            # == 16 * (q_hi - 8)  EXACTLY, no shift
                                   # (two's complement: signed(b) - lowNib
                                   #  sign-extends the high nibble *16)

The stray *16 on the hi half folds into the LHS: callers pre-scale
xs[:, K/2:] by 1/16 (one fused XLA elementwise, alongside the x*r
prescale). The dot then runs on exact bf16 widenings of [-8,7] and
[-128,112] values.

Two kernel variants (pick with `variant=`):

  "unpack"  — materialize w = concat([lo, hi]) then ONE depth-K dot.
              5 VPU passes over the weight tile (&, 2 casts, 2 subs)
              plus the concat relayout.
  "two_dot" — never materialize centered weights; use the identity
                  y = a_lo @ (low - 8) + a_hi @ (p - low)
                    = (a_lo - a_hi) @ low + a_hi @ p - 8*rowsum(a_lo)
              where low = p & 0xF and p is the signed packed byte
              itself. In-kernel weight-side work drops to ONE int8
              `&` and TWO int8->bf16 casts (no subs, no concat); the
              -8*rowsum correction and the (a_lo - a_hi) fold are
              O(B*K) XLA elementwise outside. Two depth-K/2 dots =
              the same MXU FLOPs as one depth-K dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm4_kernel(xs_ref, p_ref, out_ref, *, acc_dtype):
    # Mosaic legalizes int8 `&` and the int8->bf16 widening cast, but NOT
    # int8 sub (arith.subi on i8 vectors fails to legalize, measured
    # 2026-08-17) — so both subtractions run in bf16, where every value
    # here (|.| <= 240, integers) is exactly representable.
    p = p_ref[:]                                   # [K/2, t] int8, packed
    low = (p & 0xF).astype(jnp.bfloat16)           # [0, 15]
    lo = low - 8.0                                 # q_lo - 8   in [-8, 7]
    hi = p.astype(jnp.bfloat16) - low              # 16*(q_hi-8)
    w = jnp.concatenate([lo, hi], axis=0)          # [K, t]
    out_ref[:] = jnp.dot(
        xs_ref[:].astype(jnp.bfloat16), w,
        preferred_element_type=acc_dtype,
    ).astype(out_ref.dtype)


def _mm4_kernel_two_dot(a_ref, p_ref, out_ref, *, acc_dtype):
    """a = [a_lo - a_hi | a_hi] pre-folded by the caller; see module doc."""
    p = p_ref[:]                                   # [K/2, t] int8, packed
    low = (p & 0xF).astype(jnp.bfloat16)           # q_lo in [0, 15]
    pb = p.astype(jnp.bfloat16)                    # 16*(q_hi-8) + q_lo
    a = a_ref[:].astype(jnp.bfloat16)              # [B, K]
    k2 = p.shape[0]
    acc = jnp.dot(a[:, :k2], low, preferred_element_type=acc_dtype)
    acc = acc + jnp.dot(a[:, k2:], pb, preferred_element_type=acc_dtype)
    out_ref[:] = acc.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("tile_o", "interpret", "vma", "variant"))
def mm4(
    xs: jax.Array,   # [B, K] float32 — already scaled by r, hi half by r/16
    wp: jax.Array,   # [K/2, O] int8 — nibble-packed (ops.quant.quantize4)
    *,
    tile_o: int = 256,
    interpret: bool = False,
    vma: frozenset | None = None,
    variant: str = "two_dot",
) -> jax.Array:
    """(xs @ unpack4(wp)) with fused in-register unpack. Returns [B, O] f32.

    variant="unpack": xs MUST already carry the 1/16 on its hi-half
    columns. variant="two_dot": xs must be the folded LHS
    [a_lo - a_hi | a_hi] (a_hi already /16) and the caller adds the
    -8*rowsum(a_lo) correction. Use qmatmul4_pallas for the full
    affine math either way."""
    B, K2 = xs.shape[0], wp.shape[0]
    K = 2 * K2
    assert xs.shape[1] == K, (xs.shape, wp.shape)
    assert wp.dtype == jnp.int8, wp.dtype
    O = wp.shape[1]

    Bp = _round_up(max(B, 8), 8)
    if Bp != B:
        xs = jnp.pad(xs, ((0, Bp - B), (0, 0)))
    tile_o = min(tile_o, _round_up(O, 128))
    Op = _round_up(O, tile_o)
    if Op != O:
        wp = jnp.pad(wp, ((0, 0), (0, Op - O)))

    body = _mm4_kernel if variant == "unpack" else _mm4_kernel_two_dot
    kernel = functools.partial(body, acc_dtype=jnp.float32)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(Op // tile_o,),
        in_specs=[
            pl.BlockSpec((Bp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, tile_o), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bp, tile_o), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.float32, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * Op,
            bytes_accessed=K2 * Op + Bp * K * 4 + Bp * Op * 4,
            transcendentals=0,
        ),
    )(xs, wp)
    return out[:B, :O]


def q4_fold_lhs(xr: jax.Array):
    """[a_lo - a_hi/16 | a_hi/16] plus the -8*rowsum(a_lo) correction.

    xr is the r-scaled activation [B, K]; returns (a2 [B, K], corr [B, 1])
    for the two_dot kernel variant (all fused XLA elementwise)."""
    K = xr.shape[-1]
    a_lo = xr[:, : K // 2]
    a_hi = xr[:, K // 2:] * (1.0 / 16.0)
    a2 = jnp.concatenate([a_lo - a_hi, a_hi], axis=-1)
    corr = -8.0 * jnp.sum(a_lo, axis=-1, keepdims=True)
    return a2, corr


def qmatmul4_pallas(x: jax.Array, q, *, tile_o: int = 256,
                    interpret: bool = False, variant: str = "two_dot"):
    """Drop-in for ops.quant.q4matmul using the Pallas kernel.

    x: [..., K]; q: Quant4Linear with wp [K/2, O]. Returns [..., O] f32."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    xb = x.reshape((-1, K))
    xr = xb * q.scale
    if variant == "two_dot":
        a2, corr = q4_fold_lhs(xr)
        main = mm4(a2, q.wp, tile_o=tile_o, interpret=interpret,
                   variant=variant) + corr
    else:
        xs = xr.at[:, K // 2:].multiply(1.0 / 16.0)
        main = mm4(xs, q.wp, tile_o=tile_o, interpret=interpret,
                   variant=variant)
    off = (xb @ q.offset)[:, None]
    return (main + off).reshape(lead + (q.wp.shape[-1],))
