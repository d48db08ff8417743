"""Per-shard Pallas kernels for the tensor-parallel decode step.

The fully-fused decode stack (ops/pallas/decode_stack.py) runs all L layers
in one kernel — possible only because nothing in the single-chip step needs
communication. Under tensor parallelism the step has two mandatory
reduction points per block (att out-projection psum, ffn value psum;
parallel/tp_step.py), and a Pallas kernel cannot span an XLA collective.
So the TP body splits each block at exactly those points into two
per-shard kernels:

  att_half : ln1 + token-shift mix + 3 column-parallel u8 matvecs
             (k/v/r on this shard's E/tp channels) + WKV recurrence +
             row-parallel out-projection PARTIAL (offset term folded)
  ffn_half : ln2 + mix + column-parallel gate & key matvecs + relu^2 +
             row-parallel value PARTIAL + sigmoid gate (local channels)

Everything between two collectives runs as ONE kernel: weights stream
HBM->VMEM tile-by-tile (double-buffered by Pallas), activations and the
elementwise glue stay in VMEM — the same speed-of-light properties as the
fused stack, per shard. The collectives and the residual adds are the only
XLA ops per layer (3 collectives per block, pinned in tests/test_tp_step.py).

Both kernels are LAYER-INDEXED VIA SCALAR PREFETCH: the caller's lax.scan
over layers passes `l` as a prefetched scalar, and every weight BlockSpec
index map reads its layer block straight out of the full [L, ...] HBM
array — no per-layer dynamic-slice materialization (which would copy the
entire model through HBM once per token).

Reference analog: the per-shard slice of the CUDA op chain
include/rwkv/cuda/rwkv.cu:493-593 — but as two fused kernels per layer
instead of ~15 launches, and with the quant-offset partials folded into
the matmul partials so each half needs exactly one reduction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.ops.pallas.decode_stack import _bsum, _dot, _ln


def _att_half_kernel(
    lref,                                   # scalar prefetch: [1] layer idx
    x, xy,                                  # [Bp, E]
    ln1w, ln1b, mix_k, mix_v, mix_r,        # [1, E]
    kr, vr, rr, ko, vo, ro,                 # [1, E]
    km, vm, rm,                             # [1, E, tile] i8
    wout,                                   # [1, tile, E] i8
    wout_r, wout_o,                         # [1, tile]
    decay, bonus,                           # [1, tile]
    aa_in, bb_in, pp_in,                    # [1, Bp, tile]
    partial_out,                            # [Bp, E]
    aa_out, bb_out, pp_out,                 # [Bp, tile]
    xs_k, xs_v, xs_r, out_acc,              # scratch [Bp, E] f32
    offs,                                   # scratch [4, Bp, 128] f32
    *, n_loc: int,
):
    # NOTE: xx (the new token-shift memory) is NOT an output — it is
    # replicated across shards, and emitting it from a kernel whose other
    # inputs are model-varying would type it varying under check_vma; the
    # caller recomputes it as one XLA fusion (ln is O(B·E)).
    j = pl.program_id(0)
    OFFK, OFFV, OFFR, OUTO = range(4)

    @pl.when(j == 0)
    def _():
        xx = _ln(x[:], ln1w[0], ln1b[0])
        mk, mv, mr = mix_k[0], mix_v[0], mix_r[0]
        ik = mk * xx + (1.0 - mk) * xy[:]
        iv = mv * xx + (1.0 - mv) * xy[:]
        ir = mr * xx + (1.0 - mr) * xy[:]
        xs_k[:] = ik * kr[0]
        xs_v[:] = iv * vr[0]
        xs_r[:] = ir * rr[0]
        offs[OFFK] = _bsum(ik * ko[0])
        offs[OFFV] = _bsum(iv * vo[0])
        offs[OFFR] = _bsum(ir * ro[0])
        offs[OUTO] = jnp.zeros_like(offs[OUTO])
        out_acc[:] = jnp.zeros_like(out_acc)

    k_t = _dot(xs_k[:], km[0]) + offs[OFFK][:, :1]
    v_t = _dot(xs_v[:], vm[0]) + offs[OFFV][:, :1]
    r_t = _dot(xs_r[:], rm[0]) + offs[OFFR][:, :1]

    # WKV recurrence on this tile's channels (stable max-shift form,
    # identical to decode_stack / ops/wkv.py)
    w_t, u_t = decay[0], bonus[0]
    aa, bb, pp = aa_in[0], bb_in[0], pp_in[0]
    ww = u_t + k_t
    q = jnp.maximum(pp, ww)
    e1 = jnp.exp(pp - q)
    e2 = jnp.exp(ww - q)
    ywkv = (e1 * aa + e2 * v_t) / (e1 * bb + e2)
    ww2 = pp + w_t
    p2 = jnp.maximum(ww2, k_t)
    f1 = jnp.exp(ww2 - p2)
    f2 = jnp.exp(k_t - p2)
    aa_out[:] = f1 * aa + f2 * v_t
    bb_out[:] = f1 * bb + f2
    pp_out[:] = p2

    rwkv_t = (1.0 / (1.0 + jnp.exp(-r_t))) * ywkv
    # row-parallel out-projection partial; rank-1 offset partial rides along
    out_acc[:] += _dot(rwkv_t * wout_r[0], wout[0])
    offs[OUTO] += _bsum(rwkv_t * wout_o[0])

    @pl.when(j == n_loc - 1)
    def _():
        partial_out[:] = out_acc[:] + offs[OUTO][:, :1]


def _ffn_half_kernel(
    lref,
    x, dd,                                  # [Bp, E]
    ln2w, ln2b, fmix_k, fmix_r,             # [1, E]
    fkr, fko, gr, go,                       # [1, E]
    ffnk, wg,                               # [1, E, tile] i8
    ffnv,                                   # [1, tile, E] i8
    fvr, fvo,                               # [1, tile]
    v_partial,                              # [Bp, E]
    gate_out,                               # [Bp, tile]
    xs_fk, xs_fr, vacc,                     # scratch [Bp, E] f32
    offs,                                   # scratch [3, Bp, 128] f32
    *, n_gate: int, n_loc: int,
):
    # xx2 is not an output for the same check_vma reason as att_half.
    j = pl.program_id(0)
    FFK, FFR, FFV = range(3)

    @pl.when(j == 0)
    def _():
        xx2 = _ln(x[:], ln2w[0], ln2b[0])
        fk, fr = fmix_k[0], fmix_r[0]
        ik = fk * xx2 + (1.0 - fk) * dd[:]
        ir = fr * xx2 + (1.0 - fr) * dd[:]
        xs_fk[:] = ik * fkr[0]
        xs_fr[:] = ir * gr[0]
        offs[FFK] = _bsum(ik * fko[0])
        offs[FFR] = _bsum(ir * go[0])
        offs[FFV] = jnp.zeros_like(offs[FFV])
        vacc[:] = jnp.zeros_like(vacc)

    # one gate tile per early step (n_gate = E_loc/tile <= n_loc = F_loc/tile)
    @pl.when(j < n_gate)
    def _():
        g_t = _dot(xs_fr[:], wg[0]) + offs[FFR][:, :1]
        gate_out[:] = 1.0 / (1.0 + jnp.exp(-g_t))

    h_t = _dot(xs_fk[:], ffnk[0]) + offs[FFK][:, :1]
    h_t = jnp.maximum(h_t, 0.0)
    h_t = h_t * h_t
    vacc[:] += _dot(h_t * fvr[0], ffnv[0])
    offs[FFV] += _bsum(h_t * fvo[0])

    @pl.when(j == n_loc - 1)
    def _():
        v_partial[:] = vacc[:] + offs[FFV][:, :1]


def pick_tp_tile(n_embd: int, e_loc: int,
                 vmem_budget: int = 13 * 1024 * 1024) -> int:
    """Largest 128-multiple tile dividing the LOCAL channel width that keeps
    the double-buffered weight streams in VMEM (att half is the wider one:
    4 blocks of E x tile i8, double-buffered -> 8·E·tile bytes)."""
    for t in (512, 384, 256, 128):
        if e_loc % t == 0 and 8 * n_embd * t <= vmem_budget:
            return t
    raise ValueError(
        f"local channel width {e_loc} (E={n_embd}) has no 128-multiple tile"
    )


def _pad_b(x, Bp):
    return jnp.pad(x, ((0, Bp - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _r3(a):
    """[L, X] -> [L, 1, X]: Mosaic requires a block's trailing two dims to
    divide (8, 128) or equal the array's — (1, 1, X) blocks satisfy it."""
    return a.reshape(a.shape[0], 1, a.shape[1])


def att_half(
    l: jax.Array,            # scalar int32 layer index
    x: jax.Array,            # [B, E] f32 residual stream (full width)
    xy: jax.Array,           # [B, E] token-shift memory (full width)
    ln1w, ln1b,              # [L, E]
    mix_k, mix_v, mix_r,     # [L, E]
    kr, vr, rr, ko, vo, ro,  # [L, E] replicated quant vecs (contracted dim)
    km, vm, rm,              # [L, E, E_loc] i8 column shards
    wout,                    # [L, E_loc, E] i8 row shard
    wout_r, wout_o,          # [L, E_loc] sharded quant vecs
    decay, bonus,            # [L, E_loc] this shard's channels
    aa, bb, pp,              # [B, E_loc] WKV channel state (this layer)
    *,
    tile: int | None = None,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One layer's att half on this shard. Returns
    (out_partial [B, E], aa', bb', pp' [B, E_loc]). The new token-shift
    memory xx = ln1(x) is left to the caller (replicated, one XLA fusion).
    vma: varying-manual-axes of the outputs when called inside a
    check_vma shard_map (e.g. frozenset({'data','model'}))."""
    B, E = x.shape
    El = km.shape[-1]
    if tile is None:
        tile = pick_tp_tile(E, El)
    assert El % tile == 0, (El, tile)
    n_loc = El // tile

    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x, xy, aa, bb, pp = (_pad_b(a, Bp) for a in (x, xy, aa, bb, pp))

    f32 = jnp.float32
    row = pl.BlockSpec((1, 1, E), lambda j, lr: (lr[0], 0, 0),
                       memory_space=pltpu.VMEM)
    vec_loc = pl.BlockSpec((1, 1, tile), lambda j, lr: (lr[0], 0, j),
                           memory_space=pltpu.VMEM)
    colT = pl.BlockSpec((1, E, tile), lambda j, lr: (lr[0], 0, j),
                        memory_space=pltpu.VMEM)
    rowT = pl.BlockSpec((1, tile, E), lambda j, lr: (lr[0], j, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((Bp, E), lambda j, lr: (0, 0),
                        memory_space=pltpu.VMEM)
    st_in = pl.BlockSpec((1, Bp, tile), lambda j, lr: (0, 0, j),
                         memory_space=pltpu.VMEM)
    st_out = pl.BlockSpec((Bp, tile), lambda j, lr: (0, j),
                          memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_loc,),
        in_specs=[
            full, full,
            row, row, row, row, row,
            row, row, row, row, row, row,
            colT, colT, colT,
            rowT,
            vec_loc, vec_loc,
            vec_loc, vec_loc,
            st_in, st_in, st_in,
        ],
        out_specs=(full, st_out, st_out, st_out),
        scratch_shapes=[
            pltpu.VMEM((Bp, E), f32) for _ in range(4)
        ] + [pltpu.VMEM((4, Bp, 128), f32)],
    )
    weight_bytes = (3 * E * El + El * E)
    sds = functools.partial(jax.ShapeDtypeStruct, dtype=f32, vma=vma)
    outs = pl.pallas_call(
        functools.partial(_att_half_kernel, n_loc=n_loc),
        grid_spec=grid_spec,
        out_shape=(
            sds((Bp, E)), sds((Bp, El)), sds((Bp, El)), sds((Bp, El)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * weight_bytes,
            bytes_accessed=weight_bytes,
            transcendentals=4 * Bp * El,
        ),
    )(
        jnp.asarray(l, jnp.int32)[None],
        x, xy,
        _r3(ln1w), _r3(ln1b), _r3(mix_k), _r3(mix_v), _r3(mix_r),
        _r3(kr), _r3(vr), _r3(rr), _r3(ko), _r3(vo), _r3(ro),
        km, vm, rm, wout, _r3(wout_r), _r3(wout_o),
        _r3(decay), _r3(bonus),
        aa[None], bb[None], pp[None],
    )
    partial, aa2, bb2, pp2 = outs
    return (partial[:B], aa2[:B], bb2[:B], pp2[:B])


def ffn_half(
    l: jax.Array,
    x: jax.Array,            # [B, E] residual stream after att psum
    dd: jax.Array,           # [B, E] ffn token-shift memory
    ln2w, ln2b,              # [L, E]
    fmix_k, fmix_r,          # [L, E]
    fkr, fko, gr, go,        # [L, E] replicated quant vecs
    ffnk,                    # [L, E, F_loc] i8 column shard
    wg,                      # [L, E, E_loc] i8 column shard (receptance)
    ffnv,                    # [L, F_loc, E] i8 row shard
    fvr, fvo,                # [L, F_loc] sharded quant vecs
    *,
    tile: int | None = None,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """One layer's ffn half on this shard. Returns
    (v_partial [B, E], gate_loc [B, E_loc]); xx2 = ln2(x) is left to the
    caller (replicated). vma: see att_half."""
    B, E = x.shape
    Fl = ffnk.shape[-1]
    El = wg.shape[-1]
    if tile is None:
        tile = pick_tp_tile(E, El)
    assert Fl % tile == 0 and El % tile == 0, (Fl, El, tile)
    n_loc = Fl // tile
    n_gate = El // tile
    assert n_loc >= n_gate, (
        f"gate tiles ride along the first ffn steps; needs F_loc/tile "
        f"({n_loc}) >= E_loc/tile ({n_gate}) — true for RWKV's F = 4E"
    )

    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x, dd = _pad_b(x, Bp), _pad_b(dd, Bp)

    f32 = jnp.float32

    def clampg(j):
        return jnp.minimum(j, n_gate - 1)

    row = pl.BlockSpec((1, 1, E), lambda j, lr: (lr[0], 0, 0),
                       memory_space=pltpu.VMEM)
    vec_loc = pl.BlockSpec((1, 1, tile), lambda j, lr: (lr[0], 0, j),
                           memory_space=pltpu.VMEM)
    colT = pl.BlockSpec((1, E, tile), lambda j, lr: (lr[0], 0, j),
                        memory_space=pltpu.VMEM)
    colG = pl.BlockSpec((1, E, tile), lambda j, lr: (lr[0], 0, clampg(j)),
                        memory_space=pltpu.VMEM)
    rowT = pl.BlockSpec((1, tile, E), lambda j, lr: (lr[0], j, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((Bp, E), lambda j, lr: (0, 0),
                        memory_space=pltpu.VMEM)
    gate_out = pl.BlockSpec((Bp, tile), lambda j, lr: (0, clampg(j)),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_loc,),
        in_specs=[
            full, full,
            row, row, row, row,
            row, row, row, row,
            colT, colG, rowT,
            vec_loc, vec_loc,
        ],
        out_specs=(full, gate_out),
        scratch_shapes=[
            pltpu.VMEM((Bp, E), f32) for _ in range(3)
        ] + [pltpu.VMEM((3, Bp, 128), f32)],
    )
    weight_bytes = E * Fl + E * El + Fl * E
    sds = functools.partial(jax.ShapeDtypeStruct, dtype=f32, vma=vma)
    outs = pl.pallas_call(
        functools.partial(_ffn_half_kernel, n_gate=n_gate, n_loc=n_loc),
        grid_spec=grid_spec,
        out_shape=(
            sds((Bp, E)), sds((Bp, El)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * weight_bytes,
            bytes_accessed=weight_bytes,
            transcendentals=Bp * (El + Fl),
        ),
    )(
        jnp.asarray(l, jnp.int32)[None],
        x, dd,
        _r3(ln2w), _r3(ln2b), _r3(fmix_k), _r3(fmix_r),
        _r3(fkr), _r3(fko), _r3(gr), _r3(go),
        ffnk, wg, ffnv, _r3(fvr), _r3(fvo),
    )
    v_partial, gate_loc = outs
    return v_partial[:B], gate_loc[:B]
