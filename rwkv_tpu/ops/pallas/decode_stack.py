"""The fused decode-stack kernel: all L layers of an RWKV-v4 decode step —
and, when shapes allow, the ln_out + quantized logits head too — in ONE
Pallas kernel launch.

Why: at decode batch sizes RWKV is pure HBM streaming (~12·E² quantized
weight bytes per layer per token, plus the V×E head). The XLA path spends
~15 kernel dispatches per layer on matvecs + elementwise glue (~1.5 us floor
each), capping throughput well below the HBM roofline. Here the whole
residual stack is a single kernel: weights stream tile-by-tile HBM->VMEM
(auto double-buffered by Pallas), the activation vector and all elementwise
math (layernorm, token-shift mix, WKV recurrence, gating) stay in VMEM, and
every weight byte is read exactly once per token. Fusing the head removes
the last serial dispatch: its tiles stream inline right after the final
ffn tile, at kernel bandwidth.

This is the TPU-native answer to the reference's per-op kernel chain
(cuda_rwkv_parralel, include/rwkv/cuda/rwkv.cu:493-593): same op sequence,
but MXU matmuls + VMEM residency + sequential-grid accumulation instead of
~185 kernel launches with atomicAdd reductions.

The grid is a FLAT 1-D sequence of steps (TPU grids execute sequentially on
a core). With S = nE + nF steps per layer and H head tiles:

  t in [l·S,      l·S+nE)    layer l att: k/v/r tile matvecs + WKV tile +
                             partial out-projection
  t in [l·S+nE,   (l+1)·S)   layer l ffn: key tile -> relu^2 -> partial
                             value accumulation; the first nE of these
                             steps ALSO compute one sigmoid-gate tile each
                             (gate rides along — nF >= nE always since
                             F = 4E — saving nE grid steps per layer)
  t in [L·S,      L·S+H)     ln_out + head tile matvecs -> logits
                             (flattening is what makes this affordable: a
                             2-D (L, S+H) grid would spend (L-1)·H no-op
                             steps re-fetching clamped head blocks)

Weights are SIGNED int8 (ops.quant.to_signed; Mosaic has no u8->float cast).
Per-input-channel affine dequant is algebraically split as in ops/quant.py:
scales fold into the activation vector, offsets become rank-1 corrections
accumulated in VMEM alongside the matmul partials.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.models.rwkv4 import RWKVParams, WKVState


def _ln(x, w, b, eps=1e-8):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps) * w + b


def _dot(a, b_i8):
    return jax.lax.dot_general(
        a, b_i8.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_s8(a_i8, b_i8):
    """Native s8 x s8 -> s32 MXU matmul: no widening pass at all."""
    return jax.lax.dot_general(
        a_i8, b_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _dot4(a2, p, dot_dtype=jnp.float32):
    """Folded-LHS 4-bit matmul (the mm4.py two_dot identity, measured at
    2x mm8 bandwidth): a2 = [a_lo - a_hi/16 | a_hi/16] from _fold4; p is
    the nibble-packed [K/2, t] int8 block. Weight-side VPU work is ONE
    int8 `&` + TWO int8 widening casts; the centering lives in the
    caller's offs correction.

    dot_dtype=bfloat16 (the q4_bf16 decode_stack option) halves the
    widened operands' VMEM footprint and runs the MXU at its native
    rate: nibble/packed values are integers in [-128, 127] — EXACT in
    bf16 — so only the folded activations round (~0.4% rel), the same
    noise class as mm8's lhs_bf16. Accumulation stays f32. MEASURED
    SLOWER at 430M (0.93x the f32 dots, BENCH_NOTES round-5): Mosaic's
    int8->f32 widening is the fast path. Kept as a re-probe lever."""
    k2 = p.shape[0]
    low = (p & 0xF).astype(dot_dtype)
    pb = p.astype(dot_dtype)
    a2 = a2.astype(dot_dtype)
    dn = (((1,), (0,)), ((), ()))
    return (
        jax.lax.dot_general(a2[:, :k2], low, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(a2[:, k2:], pb, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )


def _fold4(xr):
    """LHS fold for _dot4: scaled activations [B, K] ->
    ([B, K] folded LHS, [B, 128] broadcast -8*rowsum(a_lo) correction)."""
    k2 = xr.shape[1] // 2
    a_hi = xr[:, k2:] * 0.0625
    a_lo = xr[:, :k2]
    a2 = jnp.concatenate([a_lo - a_hi, a_hi], axis=1)
    return a2, -8.0 * _bsum(a_lo)


def _quant_rows(x):
    """Per-row dynamic symmetric int8 quantization: x ~= q * s."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-30)
    q = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return q, jnp.broadcast_to(s, (x.shape[0], 128))


def _bsum(x):
    """Row-sum broadcast across a full 128-lane register: [Bp, n] -> [Bp, 128]."""
    s = jnp.sum(x, axis=-1, keepdims=True)
    return jnp.broadcast_to(s, (x.shape[0], 128))


def _decode_stack_kernel(
    *refs,
    n_att: int, n_ffn: int, tile: int, n_layer: int, n_head: int,
    a8: bool, with_head: bool, fuse_embed: int, pretiled: bool,
    q4: bool = False, q4_bf16: bool = False,
):
    _d4 = functools.partial(
        _dot4, dot_dtype=jnp.bfloat16 if q4_bf16 else jnp.float32)
    # ----- unpack (positional refs: inputs, then outputs, then scratch) ----
    ln0_w = ln0_b = None
    emb_rows = ()
    if fuse_embed:
        # scalar-prefetch token ref first, then one gathered [1,1,E] emb
        # row per batch element, then ln0
        _tok_ref = refs[0]
        emb_rows = refs[1:1 + fuse_embed]
        ln0_w, ln0_b = refs[1 + fuse_embed:3 + fuse_embed]
        x_in = None
        refs = refs[3 + fuse_embed:]
    else:
        x_in = refs[0]                           # [Bp, E] post-ln0 embedding
        refs = refs[1:]
    (
        ln1_w, ln1_b, ln2_w, ln2_b,             # [1, E]
        mix_k, mix_v, mix_r, fmix_k, fmix_r,    # [1, E]
        decay, bonus,                           # [1, T] att-tile blocks
        xy_in, aa_in, bb_in, pp_in, dd_in,      # [1,Bp,E] / [1,Bp,T] tiles
        km, vm, rm,                             # [1, E, T] i8
        kr, vr, rr, ko, vo, ro,                 # [1, E]
        wout,                                   # [1, T, E] i8
        wout_r, wout_o,                         # [1, T]
        wg, gr, go,                             # [1,E,T] i8 / [1,E] / [1,E]
        ffnk, fkr, fko,                         # [1,E,T] i8 / [1,E] / [1,E]
        ffnv, fvr, fvo,                         # [1,T,E] i8 / [1,T] / [1,T]
    ) = refs[:37]
    i = 37
    if with_head:
        lnout_w, lnout_b, hw, hr, ho = refs[i:i + 5]   # [1,E]x2, [E,T] i8,
        i += 5                                          # [1,E], [1,E]
    (
        y_out,                                  # [Bp, E]
        xy_out, dd_out,                         # [1, Bp, E]
        aa_out, bb_out, pp_out,                 # [1, Bp, T]
    ) = refs[i:i + 6]
    i += 6
    if with_head:
        logits_out = refs[i]                    # [Bp, T] tile of [Bp, Vp]
        i += 1
    # Scratch layout mirrors the static build in decode_stack(): f32 xs_*
    # only without a8, int8 q_* + scls only with a8, head activation only
    # with the fused head. (Dead scratch would silently eat VMEM margin the
    # tile picker budgeted for weight blocks.)
    it = iter(refs[i:])
    xcur = next(it)
    xs_k = xs_v = xs_r = xs_fk = xs_fr = xs_h = None
    q_k = q_v = q_r = q_fk = q_fr = q_h = scls = None
    if not a8:
        xs_k, xs_v, xs_r, xs_fk, xs_fr = (
            next(it), next(it), next(it), next(it), next(it))
    gate, zacc = next(it), next(it)
    if with_head and not a8:
        xs_h = next(it)
    offs = next(it)                             # [8, Bp, 128]
    if a8:
        q_k, q_v, q_r, q_fk, q_fr = (
            next(it), next(it), next(it), next(it), next(it))  # [Bp,E] i8
        if with_head:
            q_h = next(it)
        scls = next(it)                         # [8, Bp, 128] row scales

    S = n_att + n_ffn
    t = pl.program_id(0)
    l = jnp.minimum(t // S, n_layer - 1)
    s = t - l * S                       # head phase (l = L-1) => s in [S, S+H)

    OFFK, OFFV, OFFR, OUTO, FFK, FFR, FFV, HOF = range(8)
    SK, SV, SR, SFK, SFR, SH = range(6)

    def w2(r):
        """[E, tile] view of a column-sliced weight block (4-D when the
        params were pretile_params'd into contiguous blocks)."""
        return r[0, 0] if pretiled else r[0]

    # ------------------------------------------------------------- att init
    @pl.when(s == 0)
    def _():
        @pl.when(l == 0)
        def _():
            if fuse_embed:
                # ln0 over each gathered emb row; padding rows (Bp > B)
                # reuse row 0's embedding but carry their own (zero-pad)
                # state, so they compute discarded garbage — outputs and
                # state are sliced to [:B] by the caller
                rows = jnp.concatenate(
                    [_ln(r[0], ln0_w[0], ln0_b[0]) for r in emb_rows], 0
                )  # [B, E]
                pad = xcur.shape[0] - rows.shape[0]
                if pad:
                    rows = jnp.concatenate(
                        [rows, jnp.broadcast_to(rows[:1], (pad, rows.shape[1]))], 0
                    )
                xcur[:] = rows
            else:
                xcur[:] = x_in[:]

        xx = _ln(xcur[:], ln1_w[0], ln1_b[0])
        xy = xy_in[0]
        mk, mv, mr = mix_k[0], mix_v[0], mix_r[0]
        ik = mk * xx + (1.0 - mk) * xy
        iv = mv * xx + (1.0 - mv) * xy
        ir = mr * xx + (1.0 - mr) * xy
        xy_out[0] = xx
        if q4:
            xs_k[:], ck = _fold4(ik * kr[0])
            xs_v[:], cv = _fold4(iv * vr[0])
            xs_r[:], cr = _fold4(ir * rr[0])
            offs[OFFK] = _bsum(ik * ko[0]) + ck
            offs[OFFV] = _bsum(iv * vo[0]) + cv
            offs[OFFR] = _bsum(ir * ro[0]) + cr
        else:
            if a8:
                q_k[:], scls[SK] = _quant_rows(ik * kr[0])
                q_v[:], scls[SV] = _quant_rows(iv * vr[0])
                q_r[:], scls[SR] = _quant_rows(ir * rr[0])
            else:
                xs_k[:] = ik * kr[0]
                xs_v[:] = iv * vr[0]
                xs_r[:] = ir * rr[0]
            offs[OFFK] = _bsum(ik * ko[0])
            offs[OFFV] = _bsum(iv * vo[0])
            offs[OFFR] = _bsum(ir * ro[0])
        offs[OUTO] = jnp.zeros_like(offs[OUTO])

    # ------------------------------------------------------------- att tiles
    @pl.when(s < n_att)
    def _():
        if q4:
            k_t = _d4(xs_k[:], w2(km)) + offs[OFFK][:, :1]
            v_t = _d4(xs_v[:], w2(vm)) + offs[OFFV][:, :1]
            r_t = _d4(xs_r[:], w2(rm)) + offs[OFFR][:, :1]
        elif a8:
            k_t = _dot_s8(q_k[:], w2(km)) * scls[SK][:, :1] + offs[OFFK][:, :1]
            v_t = _dot_s8(q_v[:], w2(vm)) * scls[SV][:, :1] + offs[OFFV][:, :1]
            r_t = _dot_s8(q_r[:], w2(rm)) * scls[SR][:, :1] + offs[OFFR][:, :1]
        else:
            k_t = _dot(xs_k[:], w2(km)) + offs[OFFK][:, :1]
            v_t = _dot(xs_v[:], w2(vm)) + offs[OFFV][:, :1]
            r_t = _dot(xs_r[:], w2(rm)) + offs[OFFR][:, :1]

        w_t = decay[0]
        u_t = bonus[0]
        aa = aa_in[0]
        bb = bb_in[0]
        pp = pp_in[0]

        ww = u_t + k_t
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        ywkv = (e1 * aa + e2 * v_t) / (e1 * bb + e2)

        ww2 = pp + w_t
        p2 = jnp.maximum(ww2, k_t)
        f1 = jnp.exp(ww2 - p2)
        f2 = jnp.exp(k_t - p2)
        aa_out[0] = f1 * aa + f2 * v_t
        bb_out[0] = f1 * bb + f2
        pp_out[0] = p2

        rwkv_t = (1.0 / (1.0 + jnp.exp(-r_t))) * ywkv
        # row-parallel partial of the output projection + rank-1 offset acc
        if q4:
            a2, c = _fold4(rwkv_t * wout_r[0])  # block=tile packing
            xcur[:] += _d4(a2, wout[0])
            offs[OUTO] += _bsum(rwkv_t * wout_o[0]) + c
        elif a8:
            qo, so = _quant_rows(rwkv_t * wout_r[0])
            xcur[:] += _dot_s8(qo, wout[0]) * so[:, :1]
            offs[OUTO] += _bsum(rwkv_t * wout_o[0])
        else:
            xcur[:] += _dot(rwkv_t * wout_r[0], wout[0])
            offs[OUTO] += _bsum(rwkv_t * wout_o[0])

    # ------------------------------------------------------------- gate init
    @pl.when(s == n_att)
    def _():
        xcur[:] += offs[OUTO][:, :1]  # finish att: rank-1 offset term
        xx2 = _ln(xcur[:], ln2_w[0], ln2_b[0])
        dd = dd_in[0]
        fk, fr = fmix_k[0], fmix_r[0]
        ik = fk * xx2 + (1.0 - fk) * dd
        ir = fr * xx2 + (1.0 - fr) * dd
        dd_out[0] = xx2
        if q4:
            xs_fk[:], cfk = _fold4(ik * fkr[0])
            xs_fr[:], cfr = _fold4(ir * gr[0])
            offs[FFK] = _bsum(ik * fko[0]) + cfk
            offs[FFR] = _bsum(ir * go[0]) + cfr
        else:
            if a8:
                q_fk[:], scls[SFK] = _quant_rows(ik * fkr[0])
                q_fr[:], scls[SFR] = _quant_rows(ir * gr[0])
            else:
                xs_fk[:] = ik * fkr[0]
                xs_fr[:] = ir * gr[0]
            offs[FFK] = _bsum(ik * fko[0])
            offs[FFR] = _bsum(ir * go[0])
        offs[FFV] = jnp.zeros_like(offs[FFV])
        zacc[:] = jnp.zeros_like(zacc)

    # ------------------------------------------- ffn tiles (gate rides along)
    @pl.when(jnp.logical_and(s >= n_att, s < S))
    def _():
        j = s - n_att

        # one gate tile per early ffn step (j < n_att; nF = 4·nE >= nE)
        @pl.when(j < n_att)
        def _():
            if q4:
                g_t = _d4(xs_fr[:], w2(wg)) + offs[FFR][:, :1]
            elif a8:
                g_t = (_dot_s8(q_fr[:], w2(wg)) * scls[SFR][:, :1]
                       + offs[FFR][:, :1])
            else:
                g_t = _dot(xs_fr[:], w2(wg)) + offs[FFR][:, :1]
            gate[:, pl.ds(j * tile, tile)] = 1.0 / (1.0 + jnp.exp(-g_t))

        if q4:
            h_t = _d4(xs_fk[:], w2(ffnk)) + offs[FFK][:, :1]
        elif a8:
            h_t = _dot_s8(q_fk[:], w2(ffnk)) * scls[SFK][:, :1] + offs[FFK][:, :1]
        else:
            h_t = _dot(xs_fk[:], w2(ffnk)) + offs[FFK][:, :1]
        h_t = jnp.maximum(h_t, 0.0)
        h_t = h_t * h_t
        if q4:
            a2, c = _fold4(h_t * fvr[0])  # block=tile packing
            zacc[:] += _d4(a2, ffnv[0])
            offs[FFV] += _bsum(h_t * fvo[0]) + c
        elif a8:
            qh, sh = _quant_rows(h_t * fvr[0])
            zacc[:] += _dot_s8(qh, ffnv[0]) * sh[:, :1]
            offs[FFV] += _bsum(h_t * fvo[0])
        else:
            zacc[:] += _dot(h_t * fvr[0], ffnv[0])
            offs[FFV] += _bsum(h_t * fvo[0])

        @pl.when(s == S - 1)
        def _():
            xcur[:] += gate[:] * (zacc[:] + offs[FFV][:, :1])

            @pl.when(l == n_layer - 1)
            def _():
                y_out[:] = xcur[:]

    # --------------------------------------------------- ln_out + head tiles
    if with_head:
        @pl.when(s == S)  # only reachable on the last layer
        def _():
            h = _ln(xcur[:], lnout_w[0], lnout_b[0])
            if q4:
                xs_h[:], ch = _fold4(h * hr[0])
                offs[HOF] = _bsum(h * ho[0]) + ch
            elif a8:
                q_h[:], scls[SH] = _quant_rows(h * hr[0])
                offs[HOF] = _bsum(h * ho[0])
            else:
                xs_h[:] = h * hr[0]
                offs[HOF] = _bsum(h * ho[0])

        @pl.when(s >= S)
        def _():
            if q4:
                logits_out[:] = _d4(xs_h[:], hw[:]) + offs[HOF][:, :1]
            elif a8:
                logits_out[:] = (
                    _dot_s8(q_h[:], hw[:]) * scls[SH][:, :1] + offs[HOF][:, :1]
                )
            else:
                logits_out[:] = _dot(xs_h[:], hw[:]) + offs[HOF][:, :1]


def pick_tile(n_embd: int, preferred: int = 512,
              vmem_budget: int = 15 * 1024 * 1024) -> int:
    """Largest lane-aligned tile dividing E that keeps the double-buffered
    weight blocks (8 tiles of E x tile int8 per grid step: 7 layer matrices
    + the head) inside VMEM.

    The full-width tile (tile == E) is considered first even above
    `preferred`: fewer grid steps measurably win when it fits (169M/E=768:
    tile 768 -> 4,633 tok/s vs tile 384 -> 4,181; per-step overhead is the
    binding constraint at small E).

    With the 15MB budget on a 16MB-VMEM core: E=768 -> 768, E=1024 -> 512
    (full width would need 16.8MB), E=2048/2560 -> 256 (384 divides
    neither; 512 over budget), E=4096/5120 -> 128.
    """
    for t in (n_embd, preferred, 512, 384, 256, 128):
        if (
            n_embd % t == 0
            and t % 128 == 0
            and (t == n_embd or t <= preferred)
            and 16 * n_embd * t <= vmem_budget
        ):
            return t
    if n_embd % 128 == 0:
        return 128
    raise ValueError(f"n_embd {n_embd} not divisible by any 128-multiple tile")


def pick_tile_q4(n_embd: int, preferred: int = 512,
                 vmem_budget: int = 15 * 1024 * 1024) -> int:
    """pick_tile for 4-bit packed weights. Budget model 12*E*tile: 8*E*t
    of double-buffered packed blocks (8 streams at (E/2) x t bytes each,
    x2 buffers) plus ~4*E*t of in-kernel f32 nibble-unpack temporaries
    (measured via 7B scoped-VMEM OOMs, see pick_head_tile). Still wider
    than Q8's 16*E*t at equal VMEM: E=1024 runs full-width, E=4096 gets
    256 instead of 128."""
    for t in (n_embd, preferred, 512, 384, 256, 128):
        if (
            n_embd % t == 0
            and t % 128 == 0
            and (t == n_embd or t <= preferred)
            and 12 * n_embd * t <= vmem_budget
        ):
            return t
    if n_embd % 128 == 0:
        return 128
    raise ValueError(f"n_embd {n_embd} not divisible by any 128-multiple tile")


def pretile_params(params: RWKVParams, tile: int | None = None) -> RWKVParams:
    """One-time physical re-layout of the five column-sliced weight families
    (att k/v/r, ffn receptance, ffn key): [L, E, O] -> [L, O/t, E, t], so
    every kernel block is ONE CONTIGUOUS HBM read.

    Why: a (1, E, tile) block of a row-major [L, E, O] array DMAs as E
    separate `tile`-byte rows. At tile=128 (E>=4096 models) those 128-byte
    bursts cap streaming at ~750 GB/s on v5e; contiguous blocks measured
    ~900 GB/s (169M's full-width tiles). The row-sliced families
    (att.output, ffn.value) already read contiguously and stay 3-D.

    decode_stack detects the 4-D weights and requires its `tile` to match.
    Prefill/XLA paths handle 4-D weights via ops.quant.qmatmul's einsum.
    """
    import dataclasses

    from rwkv_tpu.ops.quant import Quant4Linear, QuantLinear

    E = params.emb.shape[1]
    if tile is None:
        tile = (pick_tile_q4(E) if isinstance(params.att.key, Quant4Linear)
                else pick_tile(E))

    def colt(lin):
        if isinstance(lin, Quant4Linear):
            if lin.wp.ndim != 3:
                return lin
            L_, K2, O = lin.wp.shape  # packed contraction rows
            w4 = jnp.transpose(
                lin.wp.reshape(L_, K2, O // tile, tile), (0, 2, 1, 3))
            return dataclasses.replace(lin, wp=w4)
        if not isinstance(lin, QuantLinear) or lin.w.ndim != 3:
            return lin
        L_, K, O = lin.w.shape
        w4 = jnp.transpose(lin.w.reshape(L_, K, O // tile, tile), (0, 2, 1, 3))
        return QuantLinear(w=w4, scale=lin.scale, offset=lin.offset)

    return dataclasses.replace(
        params,
        att=dataclasses.replace(
            params.att,
            key=colt(params.att.key),
            value=colt(params.att.value),
            receptance=colt(params.att.receptance),
        ),
        ffn=dataclasses.replace(
            params.ffn,
            key=colt(params.ffn.key),
            receptance=colt(params.ffn.receptance),
        ),
    )


def auto_head_tile(n_embd: int, tile: int, vocab_padded: int, batch: int,
                   q4: bool = False, fuse_embed: bool = False) -> int:
    """decode_stack's head-tile auto-pick: pick_head_tile under a budget
    that accounts the batch-scaled scratch where receipts show the
    implicit q8 margin is gone.

    q4 always subtracts the f32 activation scratch ((xcur + 5 xs + gate +
    zacc + xs_h) [Bp, E] + offs) — its wider head tiles ate the q8
    defaults' implicit margin from day one (7B scoped-VMEM OOM probes).

    q8 subtracts it — plus the per-batch-element fused-embed emb-row
    streams (2 buffers x [1, E] f32 each) — at E >= 4096 and past the
    Bp=8 pad class, EXCEPT the fused-embed B=1 config. Receipts: every
    B <= 8 config at E <= 2560 compiled and measured at the unsubtracted
    picks (430M/1.5B/3B serving sweeps, BENCH_NOTES), so the margin holds
    there; at E=5120 the fused-embed B=1 pick (ht=512) measured clean
    (54.2 tok/s) but sits within ~100K of the cliff — the same pick under
    a fused-embed B=8 OOMs scoped VMEM by 316K while ht=384 runs at
    431.6 agg tok/s (BENCH_NOTES round-4). Unfused-embed at E >= 4096
    was never compiled and models ~16.1M by those receipts, so only the
    measured fused-B=1 config keeps the unsubtracted budget."""
    budget = 15 * 1024 * 1024
    bp_est = max(8, -(-batch // 8) * 8)
    scratch = 9 * bp_est * n_embd * 4 + 8 * bp_est * 128 * 4
    measured_margin = fuse_embed and batch == 1
    if q4:
        budget -= scratch
    elif (n_embd >= 4096 and not measured_margin) or bp_est > 8:
        budget -= scratch
        if fuse_embed:
            budget -= 2 * batch * n_embd * 4
    return pick_head_tile(n_embd, tile, vocab_padded, vmem_budget=budget,
                          q4=q4)


def pick_head_tile(n_embd: int, tile: int, vocab_padded: int,
                   vmem_budget: int = 15 * 1024 * 1024,
                   q4: bool = False) -> int:
    """Widest 128-multiple divisor of the padded vocab whose double-buffered
    [E, head_tile] i8 blocks fit beside the 7 layer-weight streams.

    The head phase has the whole VMEM budget minus the layer streams to
    itself, so its tiles can be much wider than the layer tile — fewer
    grid steps for the 50k-wide projection (e.g. E=1024/tile=512:
    head_tile 2816 -> 18 steps instead of 99).

    q4 coefficients are MEASURED, not derived (7B scoped-VMEM OOM probes,
    2026-08-17): the layer term is 11*E*tile (7 packed double-buffered
    streams = 7*E*t, plus ~4*E*t of in-kernel f32 nibble-unpack
    temporaries Mosaic materializes on the stack), and the head column
    cost fit 2578 B/col at E=4096 (~0.63*E) — 0.75*E used for margin."""
    layer_bytes = (11 if q4 else 14) * n_embd * tile
    hb = (3 * n_embd) // 4 if q4 else 2 * n_embd
    # q4 head tiles past ~1024 cols go superlinear in scoped VMEM at big E
    # (Mosaic stops fusing the nibble-unpack casts: 7B t=128/ht=2304
    # measured ~1.07*E per col vs 0.63*E at ht<=1536; E=1024/ht=2816
    # fuses fine) — and the head is <3% of a >=7B model's bytes, so
    # capping there costs nothing.
    ht_max = min(vocab_padded, 1024) if (q4 and n_embd >= 2048) \
        else vocab_padded
    for ht in range(ht_max, 127, -128):
        if vocab_padded % ht == 0 and layer_bytes + hb * ht <= vmem_budget:
            return ht
    return 128  # always fits: layer_bytes <= 14/16 budget by construction


@functools.partial(jax.jit,
                   static_argnames=("tile", "head_tile", "interpret", "a8",
                                    "with_head", "fuse_embed", "q4_bf16"))
def decode_stack(
    x: jax.Array,            # [B, E] post-ln0 embedded token(s); ignored
                             # (pass zeros) when fuse_embed
    params: RWKVParams,      # quantized, SIGNED int8 weights
    state: WKVState,         # leaves [L, B, E]
    *,
    token: jax.Array | None = None,   # [B] int32, only with fuse_embed
    tile: int | None = None,
    head_tile: int | None = None,
    interpret: bool = False,
    a8: bool = False,
    with_head: bool = False,
    fuse_embed: bool = False,
    q4_bf16: bool | None = None,
):
    """Run all L blocks on x. Returns (new x [B, E], new state) — plus raw
    logits [B, Vp] as a third element when with_head=True (requires a
    quantized head with padded vocab divisible by the tile; the caller
    still applies logit_bias).

    a8=True runs every matvec as native s8 x s8 -> s32 on the MXU with
    per-row dynamic activation quantization (no u8->float widening pass);
    adds ~0.4% relative activation noise — validate ppl before serving.

    4-bit params (models.rwkv4.quantize_params_q4) are auto-detected:
    weight blocks stream nibble-packed at HALF the HBM bytes and every
    matvec runs through the _dot4 two-dot identity (measured 2x mm8
    bandwidth, BENCH_NOTES round-4).

    q4_bf16=True runs the q4 two-dot in bfloat16 (integer nibble/packed
    operands are exact; folded activations round ~0.4% rel — mm8's
    lhs_bf16 noise class; f32 accumulation). Measured SLOWER than the
    f32 dots at 430M (0.93x — BENCH_NOTES round-5); default stays f32.
    None reads the RWKV_TPU_Q4_DOT env knob ('bf16' opts in) ONCE at
    trace time — the resolved value is baked into the jit cache for
    this static-arg combination, so flip it via the explicit argument
    (not env) when A/B-ing inside one process."""
    import os as _os

    from rwkv_tpu.ops.quant import Quant4Linear, QuantLinear

    att, ffn = params.att, params.ffn
    q4 = isinstance(att.key, Quant4Linear)
    if q4_bf16 is None:
        q4_bf16 = _os.environ.get("RWKV_TPU_Q4_DOT", "f32") == "bf16"
    q4_bf16 = bool(q4_bf16) and q4
    if q4:
        if a8:
            raise ValueError("a8 and 4-bit weights are mutually exclusive")
        fams = (att.key, att.value, att.receptance, att.output,
                ffn.key, ffn.value, ffn.receptance)
        if not all(isinstance(f, Quant4Linear) for f in fams):
            raise TypeError(
                "4-bit decode requires ALL matrix families Quant4Linear; "
                "use models.rwkv4.quantize_params_q4"
            )
    elif att.key.w.dtype != jnp.int8:
        raise TypeError(
            "decode_stack requires signed int8 weights; apply "
            "rwkv_tpu.models.rwkv4 signedize/ops.quant.to_signed at load time"
        )
    wv = (lambda lin: lin.wp) if q4 else (lambda lin: lin.w)
    L = att.decay.shape[0]
    B, E = x.shape
    pretiled = wv(att.key).ndim == 4
    if pretiled:
        # pretile_params layout: [L, O/t, E(,/2), t] — tile is baked in
        pt = wv(att.key).shape[-1]
        if tile is None:
            tile = pt
        elif tile != pt:
            raise ValueError(
                f"params were pretiled for tile={pt}, got tile={tile}"
            )
        F = wv(ffn.key).shape[1] * wv(ffn.key).shape[3]
    else:
        F = wv(ffn.key).shape[-1]
        if tile is None:
            tile = pick_tile_q4(E) if q4 else pick_tile(E)
    if q4:
        if att.output.block != tile or ffn.value.block != tile:
            raise ValueError(
                f"4-bit row-tiled families packed with block="
                f"{att.output.block}/{ffn.value.block} but kernel tile is "
                f"{tile}; requantize with quantize_params_q4(tile={tile})"
            )
        if any(f.block is not None for f in
               (att.key, att.value, att.receptance,
                ffn.key, ffn.receptance)):
            raise ValueError(
                "4-bit column-sliced families must use global split-half "
                "packing (block=None)"
            )
    assert E % tile == 0 and F % tile == 0, (E, F, tile)
    n_att, n_ffn = E // tile, F // tile
    assert n_ffn >= n_att, (
        f"gate tiles ride along the first n_att ffn steps; needs "
        f"n_ffn ({n_ffn}) >= n_att ({n_att}) — true for RWKV's F = 4E"
    )
    S = n_att + n_ffn

    n_head = 0
    if with_head:
        if q4:
            if not isinstance(params.head, Quant4Linear):
                raise TypeError("4-bit with_head requires a Quant4Linear "
                                "head (quantize_params_q4 covers it)")
        elif not isinstance(params.head, QuantLinear):
            raise TypeError("with_head requires a quantized head")
        if wv(params.head).dtype != jnp.int8:
            raise TypeError("with_head requires a signed int8 head")
        Vp = wv(params.head).shape[-1]
        if head_tile is None:
            head_tile = auto_head_tile(E, tile, Vp, B, q4=q4,
                                       fuse_embed=fuse_embed)
        if Vp % head_tile:
            raise ValueError(
                f"with_head requires padded vocab {Vp} divisible by the "
                f"head tile {head_tile}; use models.rwkv4.pad_vocab"
            )
        n_head = Vp // head_tile

    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
        state = WKVState(
            *(jnp.pad(s, ((0, 0), (0, Bp - B), (0, 0))) for s in state)
        )

    f32 = jnp.float32

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    def _l(t):
        return jnp.minimum(t // S, L - 1)

    def _s(t):
        return t - _l(t) * S

    j_att = lambda t: clamp(_s(t), 0, n_att - 1)                # noqa: E731
    j_gate = lambda t: clamp(_s(t) - n_att, 0, n_att - 1)       # noqa: E731
    j_ffn = lambda t: clamp(_s(t) - n_att, 0, n_ffn - 1)        # noqa: E731
    j_head = lambda t: clamp(_s(t) - S, 0, max(n_head - 1, 0))  # noqa: E731

    # Per-layer vectors are lifted to [L, 1, X] so the trailing two block
    # dims satisfy Mosaic's (8,128)-or-equal rule ((1,1,X): 1==1, X ok).
    def r3(a):
        return a.reshape(a.shape[0], 1, a.shape[1])

    # Index maps take *a because the fuse_embed variant APPENDS a scalar-
    # prefetch ref to every index-map signature (grid indices come first,
    # then scalar refs — jax/_src/pallas/core.py get_grid_mapping); the
    # grid step is always a[0].
    def row(width):
        return pl.BlockSpec((1, 1, width), lambda *a: (_l(a[0]), 0, 0),
                            memory_space=pltpu.VMEM)

    att_vec = pl.BlockSpec((1, 1, tile),
                           lambda *a: (_l(a[0]), 0, j_att(a[0])),
                           memory_space=pltpu.VMEM)
    ffn_vec = pl.BlockSpec((1, 1, tile),
                           lambda *a: (_l(a[0]), 0, j_ffn(a[0])),
                           memory_space=pltpu.VMEM)
    full_state = pl.BlockSpec((1, Bp, E), lambda *a: (_l(a[0]), 0, 0),
                              memory_space=pltpu.VMEM)
    chan_state = pl.BlockSpec((1, Bp, tile),
                              lambda *a: (_l(a[0]), 0, j_att(a[0])),
                              memory_space=pltpu.VMEM)

    # 4-bit blocks carry half the contraction rows (nibble-packed)
    Ew = E // 2 if q4 else E
    tw = tile // 2 if q4 else tile

    def colT(jm):
        if pretiled:
            # contiguous [E(w), tile] blocks: one linear DMA per block
            return pl.BlockSpec((1, 1, Ew, tile),
                                lambda *a: (_l(a[0]), jm(a[0]), 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, Ew, tile),
                            lambda *a: (_l(a[0]), 0, jm(a[0])),
                            memory_space=pltpu.VMEM)

    def rowT(jm):
        return pl.BlockSpec((1, tw, E),
                            lambda *a: (_l(a[0]), jm(a[0]), 0),
                            memory_space=pltpu.VMEM)

    if fuse_embed:
        if B > 16:
            # one gathered emb-row input ref per batch element. Measured
            # (BENCH_NOTES "Fused embed vs batch"): big win at B<=8
            # (+19-20%), ~neutral at B=16, and at B=32 the extra Bp·E
            # activation scratch pushes the 430M tile choice 8KB past the
            # 16MB VMEM budget — larger batches embed in XLA.
            raise ValueError("fuse_embed supports B <= 16; larger batches "
                             "embed in XLA")
        if token is None:
            raise ValueError("fuse_embed requires the token array")
        if token.shape != (B,):
            raise ValueError(
                f"fuse_embed token shape {token.shape} != batch ({B},) — "
                f"each batch row gathers its own emb-row block"
            )
        # one emb-row block per batch element, each gathered straight from
        # HBM by its scalar-prefetched token; emb viewed [Vp, 1, E] so the
        # block's trailing dims (1, E) satisfy Mosaic's divisibility rule
        def emb_spec(i):
            return pl.BlockSpec((1, 1, E), lambda t, tok, i=i: (tok[i], 0, 0),
                                memory_space=pltpu.VMEM)

        x_specs = [emb_spec(i) for i in range(B)] + [
            pl.BlockSpec((1, E), lambda *a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda *a: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        x_specs = [
            pl.BlockSpec((Bp, E), lambda *a: (0, 0), memory_space=pltpu.VMEM)
        ]
    in_specs = x_specs + [
        row(E), row(E), row(E), row(E),                   # ln1/ln2 w,b
        row(E), row(E), row(E), row(E), row(E),           # mixes
        att_vec, att_vec,                                  # decay, bonus
        full_state, chan_state, chan_state, chan_state, full_state,
        colT(j_att), colT(j_att), colT(j_att),            # km vm rm
        row(E), row(E), row(E), row(E), row(E), row(E),   # kr vr rr ko vo ro
        rowT(j_att), att_vec, att_vec,                    # wout, wout_r/o
        colT(j_gate), row(E), row(E),                     # wg, gr, go
        colT(j_ffn), row(E), row(E),                      # ffnk, fkr, fko
        rowT(j_ffn), ffn_vec, ffn_vec,                    # ffnv, fvr, fvo
    ]
    out_specs = [
        pl.BlockSpec((Bp, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, E), lambda *a: (_l(a[0]), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, E), lambda *a: (_l(a[0]), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, tile), lambda *a: (_l(a[0]), 0, j_att(a[0])),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, tile), lambda *a: (_l(a[0]), 0, j_att(a[0])),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, tile), lambda *a: (_l(a[0]), 0, j_att(a[0])),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(shp, f32)
        for shp in [(Bp, E)] + [(L, Bp, E)] * 5
    ]

    if fuse_embed:
        r2e = lambda a: a.reshape(1, a.shape[0])  # noqa: E731
        emb3 = params.emb.reshape(params.emb.shape[0], 1, E)
        x_ops = [emb3] * B + [r2e(params.ln0.weight), r2e(params.ln0.bias)]
    else:
        x_ops = [x]
    operands = x_ops + [
        r3(params.ln1.weight), r3(params.ln1.bias),
        r3(params.ln2.weight), r3(params.ln2.bias),
        r3(att.mix_k), r3(att.mix_v), r3(att.mix_r),
        r3(ffn.mix_k), r3(ffn.mix_r),
        r3(att.decay), r3(att.bonus),
        state.xy, state.aa, state.bb, state.pp, state.dd,
        wv(att.key), wv(att.value), wv(att.receptance),
        r3(att.key.scale), r3(att.value.scale), r3(att.receptance.scale),
        r3(att.key.offset), r3(att.value.offset), r3(att.receptance.offset),
        wv(att.output), r3(att.output.scale), r3(att.output.offset),
        wv(ffn.receptance), r3(ffn.receptance.scale),
        r3(ffn.receptance.offset),
        wv(ffn.key), r3(ffn.key.scale), r3(ffn.key.offset),
        wv(ffn.value), r3(ffn.value.scale), r3(ffn.value.offset),
    ]

    weight_flop_bytes = L * (5 * E * E + 2 * E * F)  # unpacked weight count
    weight_bytes = weight_flop_bytes // 2 if q4 else weight_flop_bytes
    if with_head:
        r2 = lambda a: a.reshape(1, a.shape[0])  # noqa: E731
        in_specs += [
            # ln_out w/b, head scale/offset: resident rows
            pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ew, head_tile), lambda *a: (0, j_head(a[0])),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [
            r2(params.ln_out.weight), r2(params.ln_out.bias),
            wv(params.head), r2(params.head.scale), r2(params.head.offset),
        ]
        # insert head weights between ln_out vecs in order matching kernel
        out_specs.append(
            pl.BlockSpec((Bp, head_tile), lambda *a: (0, j_head(a[0])),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Bp, n_head * head_tile), f32))
        weight_flop_bytes += E * n_head * head_tile
        weight_bytes += Ew * n_head * head_tile

    # Must mirror the unpack in _decode_stack_kernel exactly.
    scratch = [pltpu.VMEM((Bp, E), f32)]                      # xcur
    if not a8:
        scratch += [pltpu.VMEM((Bp, E), f32) for _ in range(5)]   # xs_*
    scratch += [pltpu.VMEM((Bp, E), f32) for _ in range(2)]   # gate, zacc
    if with_head and not a8:
        scratch.append(pltpu.VMEM((Bp, E), f32))              # xs_h
    scratch.append(pltpu.VMEM((8, Bp, 128), f32))             # offs
    if a8:
        scratch += [pltpu.VMEM((Bp, E), jnp.int8) for _ in range(5)]
        if with_head:
            scratch.append(pltpu.VMEM((Bp, E), jnp.int8))     # q_h
        scratch.append(pltpu.VMEM((8, Bp, 128), f32))         # scls

    kernel = functools.partial(
        _decode_stack_kernel,
        n_att=n_att, n_ffn=n_ffn, tile=tile, n_layer=L, n_head=n_head,
        a8=a8, with_head=with_head, fuse_embed=(B if fuse_embed else 0),
        pretiled=pretiled, q4=q4, q4_bf16=q4_bf16,
    )
    cost = pl.CostEstimate(
        flops=2 * Bp * weight_flop_bytes,
        bytes_accessed=weight_bytes,
        transcendentals=L * Bp * (4 * E + F),
    )
    if fuse_embed:
        # token rides in as a scalar-prefetch arg: the emb row's block
        # index depends on its value, so the gather happens inside the
        # kernel's own DMA schedule (no separate XLA gather dispatch).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L * S + n_head,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shape),
            interpret=interpret,
            cost_estimate=cost,
        )(
            # clamp like XLA's gather would: an out-of-range id must not
            # become an out-of-bounds block index (undefined behavior)
            jnp.clip(jnp.asarray(token, jnp.int32), 0,
                     params.emb.shape[0] - 1),
            *operands,
        )
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(L * S + n_head,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=cost,
        )(*operands)

    y, xy, dd, aa, bb, pp = outs[:6]
    new_state = WKVState(xy=xy[:, :B], aa=aa[:, :B], bb=bb[:, :B],
                         pp=pp[:, :B], dd=dd[:, :B])
    if with_head:
        return y[:B], new_state, outs[6][:B]
    return y[:B], new_state


def forward_step_fused(
    params: RWKVParams, token: jax.Array, state: WKVState, *,
    tile: int | None = None, head_tile: int | None = None,
    interpret: bool = False, head_a8: bool = False,
    a8: bool = False, fuse_embed: bool | None = None,
    q4_bf16: bool | None = None,
) -> Tuple[jax.Array, WKVState]:
    """Full decode step on the fused stack kernel. The L-layer body, ln_out
    and the quantized head run as one kernel whenever the padded vocab is
    lane-aligned (models.rwkv4.pad_vocab); at B <= 8 even the embedding
    gathers + ln0 fold in (tokens ride as a scalar-prefetch arg, one
    gathered emb-row input per batch element), making the entire
    token -> logits step a single launch. Otherwise embed/ln0 stay in XLA
    and/or the head falls back to the standalone mm8 kernel.

    Drop-in signature parity with models.rwkv4.forward_step for scalar or
    [B] tokens (state leaves [L, E] or [L, B, E]).

    head_a8: with the fallback head only — run it as W8A8 on the native s8
    MXU. a8: run ALL matvecs (stack + head) as W8A8; see decode_stack."""
    from rwkv_tpu.ops.layernorm import layer_norm
    from rwkv_tpu.ops.pallas.mm8 import mm8, mm8_a8
    from rwkv_tpu.ops.quant import Quant4Linear, QuantLinear

    unbatched = token.ndim == 0
    tok = token[None] if unbatched else token
    st = (
        WKVState(*(s[:, None] for s in state)) if unbatched else state
    )  # [L, 1, E]

    # The head tile is decoupled from the layer tile (pick_head_tile finds
    # a 128-multiple divisor of the padded vocab), so fusability only needs
    # a lane-aligned vocab.
    if isinstance(params.head, Quant4Linear):
        head_fusable = params.head.wp.shape[-1] % 128 == 0
    else:
        head_fusable = (
            isinstance(params.head, QuantLinear)
            and params.head.w.dtype == jnp.int8
            and params.head.w.shape[-1] % 128 == 0
        )
    # auto-fuse the embedding only where it measures as a win (B <= 8:
    # +19-20%; B=16: ~-2% — BENCH_NOTES "Fused embed vs batch");
    # fuse_embed=True forces it up to the kernel's B <= 16 limit
    if fuse_embed is None:
        embed_fusable = head_fusable and tok.shape[0] <= 8
    else:
        embed_fusable = head_fusable and fuse_embed and tok.shape[0] <= 16

    if not embed_fusable:
        x = params.emb[tok].astype(jnp.float32)  # [B, E]
        x = layer_norm(x, params.ln0.weight, params.ln0.bias)
    else:
        x = jnp.zeros((tok.shape[0], params.emb.shape[1]),
                      jnp.float32)  # shape-only placeholder

    if head_fusable:
        y, new_state, logits = decode_stack(
            x, params, st, token=tok, tile=tile, head_tile=head_tile,
            interpret=interpret, a8=a8,
            with_head=True, fuse_embed=embed_fusable, q4_bf16=q4_bf16,
        )
    else:
        y, new_state = decode_stack(x, params, st, tile=tile,
                                    interpret=interpret, a8=a8,
                                    q4_bf16=q4_bf16)
        h = layer_norm(y, params.ln_out.weight, params.ln_out.bias)
        if isinstance(params.head, Quant4Linear):
            from rwkv_tpu.ops.pallas.mm4 import qmatmul4_pallas

            logits = qmatmul4_pallas(h, params.head, interpret=interpret)
        elif isinstance(params.head, QuantLinear):
            xs = h * params.head.scale
            mm = mm8_a8 if (head_a8 or a8) else mm8
            logits = (mm(xs, params.head.w, interpret=interpret)
                      + (h @ params.head.offset)[:, None])
        else:
            logits = h @ params.head

    if params.logit_bias is not None:
        logits = logits + params.logit_bias

    if unbatched:
        return logits[0], WKVState(*(s[:, 0] for s in new_state))
    return logits, new_state
