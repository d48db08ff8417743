"""Tensor-parallel fused decode stack with IN-KERNEL collectives.

ops/pallas/tp_halves.py splits each block at its two reduction points into
two Pallas kernels with XLA collectives between them — correct, but every
layer pays two kernel boundaries (pipeline drain + launch) and the
collectives sit exposed between kernels. This module is the
speed-of-light version: the ENTIRE per-shard decode step — all L layers,
ln_out and the local head shard — is ONE Pallas kernel per chip, and the
three per-layer collectives run as remote DMAs (ICI RDMA) issued inside
the kernel:

  att out-projection partial  [B, E]  -> one-shot reduce-scatter +
                                         one-shot all-gather of E/tp chunks
  ffn value partial           [B, E]  -> same
  ffn sigmoid gate            [B,E/tp]-> direct all-gather

One-shot (not ring): decode payloads are tiny (B·E·4 = 20-160 KB) —
latency-bound, so 2 RDMA phases beat 2(tp-1) ring phases. Chunked (not a
direct [B, E] exchange): the per-peer slots then cost [tp, B, E/tp]
VMEM and each link carries ~B·E bytes instead of (tp-1)·B·E — the direct
form measurably OOMs the 16MB VMEM at 14B/tp=8.

Overlap structure (the point of fusing): sends are issued the moment a
partial is complete and waited only where the data is consumed —
  * the gate exchange is issued n_att ffn-steps before its use at the
    residual update, hiding it entirely behind the ffn value matvecs;
  * the att/value exchanges ride the automatically-prefetched next-phase
    weight DMAs, so their exposure is ~one RDMA latency per reduction,
    with zero kernel-launch or XLA-dispatch overhead on top;
  * the ffn value + gate exchanges of layer l are both waited at layer
    l+1's first step, so they fly concurrently.

Weights stream tile-by-tile exactly as in the single-chip kernel
(ops/pallas/decode_stack.py) — every weight byte read once per token at
HBM speed. tp=1 compiles with no communication code at all (the pure
fused per-shard stack; bench.py impl 'tpfused').

The reference has no analog (single GPU by construction,
include/rwkv/cuda/rwkv.cu); this is the TPU-native design for the
BASELINE.json north star (>=0.9x linear multi-chip decode scaling).
Validated against the unsharded oracle on a virtual mesh via Pallas's
TPU interpret mode, which simulates inter-chip DMAs (tests/test_decode_stack_tp.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.models.rwkv4 import RWKVParams, WKVState
from rwkv_tpu.ops.pallas.decode_stack import _bsum, _dot, _dot4, _fold4, _ln


def _decode_stack_tp_kernel(
    *refs,
    tp: int, n_att: int, n_ffn: int, tile: int, n_layer: int, n_head: int,
    model_axis: str, data_axis: str | None, fuse_embed: int, pretiled: bool,
    q4: bool = False,
):
    if fuse_embed:
        # scalar prefetch: local row ids + in-my-vocab-shard mask, then one
        # gathered [1,1,E] emb row per batch element, then ln0
        _rel_ref, mine_ref = refs[0], refs[1]
        emb_rows = refs[2:2 + fuse_embed]
        ln0_w, ln0_b = refs[2 + fuse_embed:4 + fuse_embed]
        refs = refs[4 + fuse_embed:]
        x_in = None
    else:
        x_in = refs[0]
        refs = refs[1:]
    (
        ln1_w, ln1_b, ln2_w, ln2_b,             # [1, E] layer blocks
        mix_k, mix_v, mix_r, fmix_k, fmix_r,    # [1, E]
        kr, vr, rr, ko, vo, ro,                 # [1, E]
        fkr, fko, gr, go,                       # [1, E]
        decay, bonus,                           # [1, T] local att tiles
        xy_in, dd_in,                           # [1, Bp, E]
        aa_in, bb_in, pp_in,                    # [1, Bp, T] local tiles
        km, vm, rm,                             # [1, E, T] i8 col shards
        wout, wout_r, wout_o,                   # [1, T, E] i8 / [1, T]
        wg,                                     # [1, E, T] i8 (gate)
        ffnk,                                   # [1, E, T] i8
        ffnv, fvr, fvo,                         # [1, T, E] i8 / [1, T]
        lnout_w, lnout_b,                       # [1, E]
        hw, hr, ho,                             # [E, HT] i8 / [1, E]
    ) = refs[:42]
    i = 42
    (
        xy_out, dd_out,                         # [1, Bp, E]
        aa_out, bb_out, pp_out,                 # [1, Bp, T]
        logits_out,                             # [Bp, HT] tile of [Bp, Vl]
    ) = refs[i:i + 6]
    i += 6
    it = iter(refs[i:])
    xcur = next(it)                             # [Bp, E]
    xs_k, xs_v, xs_r, xs_fk, xs_fr, xs_h = (
        next(it), next(it), next(it), next(it), next(it), next(it))
    att_acc, vacc = next(it), next(it)          # [Bp, E] partials
    gate_buf = next(it)                         # [Bp, El] local gate
    offs = next(it)                             # [8, Bp, 128]
    if tp > 1:
        rs_a, ag_a = next(it), next(it)         # [tp, Bp, El] att reduce
        rs_v, ag_v = next(it), next(it)         # [tp, Bp, El] ffn-v reduce
        gate_recv = next(it)                    # [tp, Bp, El] gate gather
        chunk_a, chunk_v = next(it), next(it)   # [Bp, El] reduced chunks
        (rsa_s, rsa_r, aga_s, aga_r, rsv_s, rsv_r, agv_s, agv_r,
         gate_s, gate_r) = (next(it) for _ in range(10))

    S = n_att + n_ffn
    t = pl.program_id(0)
    l = jnp.minimum(t // S, n_layer - 1)
    s = t - l * S                    # head phase (l = L-1) => s in [S, S+H)

    OFFK, OFFV, OFFR, OUTO, FFK, FFR, FFV, HOF = range(8)

    def w2(r):
        """[E, tile] view of a column-sliced weight block (4-D when
        pretile_params laid the family out as contiguous blocks)."""
        return r[0, 0] if pretiled else r[0]

    El = gate_buf.shape[-1]
    if tp > 1:
        my = jax.lax.axis_index(model_axis)
        base = (jax.lax.axis_index(data_axis) * tp
                if data_axis is not None else 0)
        LOGICAL = pltpu.DeviceIdType.LOGICAL

        def _peer(off):
            return base + jax.lax.rem(my + off, tp)

        # All-reduce of a [Bp, E] partial = one-shot reduce-scatter (each
        # chip receives every peer's contribution for ITS E/tp chunk) +
        # one-shot all-gather of the reduced chunks. vs a direct
        # all-exchange this is tp x less ICI traffic AND tp x less VMEM
        # ([tp, Bp, E/tp] buffers instead of [tp, Bp, E] — the direct form
        # provably OOMs 16MB VMEM at 14B/tp=8).

        def _rs_dma(src_ref, rs_buf, ss, rr, off):
            p = jax.lax.rem(my + off, tp)
            return pltpu.make_async_remote_copy(
                src_ref=src_ref.at[:, pl.ds(p * El, El)],
                dst_ref=rs_buf.at[my],
                send_sem=ss, recv_sem=rr,
                device_id=base + p, device_id_type=LOGICAL)

        def _red_start(src_ref, rs_buf, ss, rr):
            rs_buf[my] = src_ref[:, pl.ds(my * El, El)]
            for off in range(1, tp):
                _rs_dma(src_ref, rs_buf, ss, rr, off).start()

        def _ag_dma(chunk, ag_buf, ss, rr, off):
            return pltpu.make_async_remote_copy(
                src_ref=chunk, dst_ref=ag_buf.at[my],
                send_sem=ss, recv_sem=rr,
                device_id=_peer(off), device_id_type=LOGICAL)

        def _red_finish(src_ref, rs_buf, ag_buf, chunk, sems):
            """Wait the scatter, sum my chunk, gather the chunks, and ADD
            the fully-reduced [Bp, E] into xcur."""
            rss, rsr, ags, agr = sems
            for off in range(1, tp):
                d = _rs_dma(src_ref, rs_buf, rss, rsr, off)
                d.wait_send()
                d.wait_recv()
            acc = rs_buf[0]
            for q in range(1, tp):
                acc = acc + rs_buf[q]
            chunk[:] = acc
            ag_buf[my] = acc
            for off in range(1, tp):
                _ag_dma(chunk, ag_buf, ags, agr, off).start()
            for off in range(1, tp):
                d = _ag_dma(chunk, ag_buf, ags, agr, off)
                d.wait_send()
                d.wait_recv()
            for p in range(tp):
                xcur[:, p * El:(p + 1) * El] += ag_buf[p]

        def _gate_start():
            gate_recv[my] = gate_buf[:]
            for off in range(1, tp):
                pltpu.make_async_remote_copy(
                    src_ref=gate_buf, dst_ref=gate_recv.at[my],
                    send_sem=gate_s, recv_sem=gate_r,
                    device_id=_peer(off), device_id_type=LOGICAL,
                ).start()

        def _gate_wait():
            for off in range(1, tp):
                d = pltpu.make_async_remote_copy(
                    src_ref=gate_buf, dst_ref=gate_recv.at[my],
                    send_sem=gate_s, recv_sem=gate_r,
                    device_id=_peer(off), device_id_type=LOGICAL)
                d.wait_send()
                d.wait_recv()

        # chips may enter the kernel at different times; no RDMA may land
        # before its target allocated scratch — barrier once at t == 0
        @pl.when(t == 0)
        def _():
            bar = pltpu.get_barrier_semaphore()
            for off in range(1, tp):
                pltpu.semaphore_signal(
                    bar, inc=1, device_id=_peer(off),
                    device_id_type=LOGICAL)
            pltpu.semaphore_wait(bar, tp - 1)

    def _finish_ffn():
        """Complete the PREVIOUS layer's gate + value exchanges and apply
        its residual update. (Deferred to here so both exchanges fly while
        that layer's tail compute and this phase's first weight DMAs run.)"""
        if tp > 1:
            _gate_wait()
            # value all-reduce lands in chunk_v / ag_v, added to a gated
            # temp rather than xcur directly: compute gate * vfull
            for off in range(1, tp):
                d = _rs_dma(vacc, rs_v, rsv_s, rsv_r, off)
                d.wait_send()
                d.wait_recv()
            acc = rs_v[0]
            for q in range(1, tp):
                acc = acc + rs_v[q]
            chunk_v[:] = acc
            ag_v[my] = acc
            for off in range(1, tp):
                _ag_dma(chunk_v, ag_v, agv_s, agv_r, off).start()
            for off in range(1, tp):
                d = _ag_dma(chunk_v, ag_v, agv_s, agv_r, off)
                d.wait_send()
                d.wait_recv()
            for p in range(tp):
                xcur[:, p * El:(p + 1) * El] += (
                    gate_recv[p] * ag_v[p])
        else:
            xcur[:] += gate_buf[:] * vacc[:]

    # ------------------------------------------------------------- att init
    @pl.when(s == 0)
    def _():
        @pl.when(l == 0)
        def _():
            if fuse_embed:
                # vocab-sharded embedding gather: each row's local block
                # was DMA'd by its prefetched id; rows outside this
                # chip's shard are masked to zero and the partials
                # reduced in-kernel (replaces the XLA gather + psum)
                rows = jnp.concatenate(
                    [emb_rows[b][0]
                     * (mine_ref[b] > 0).astype(jnp.float32)
                     for b in range(fuse_embed)], 0)   # [B, E]
                pad = xcur.shape[0] - rows.shape[0]
                if pad:
                    rows = jnp.concatenate(
                        [rows,
                         jnp.broadcast_to(rows[:1], (pad, rows.shape[1]))],
                        0)
                if tp > 1:
                    att_acc[:] = rows
                    _red_start(att_acc, rs_a, rsa_s, rsa_r)
                    xcur[:] = jnp.zeros_like(rows)
                    _red_finish(att_acc, rs_a, ag_a, chunk_a,
                                (rsa_s, rsa_r, aga_s, aga_r))
                else:
                    xcur[:] = rows
                xcur[:] = _ln(xcur[:], ln0_w[0], ln0_b[0])
            else:
                xcur[:] = x_in[:]

        @pl.when(l > 0)
        def _():
            _finish_ffn()

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
            xs_k[:] = ik * kr[0]
            xs_v[:] = iv * vr[0]
            xs_r[:] = ir * rr[0]
            offs[OFFK] = _bsum(ik * ko[0])
            offs[OFFV] = _bsum(iv * vo[0])
            offs[OFFR] = _bsum(ir * ro[0])
        offs[OUTO] = jnp.zeros_like(offs[OUTO])
        att_acc[:] = jnp.zeros_like(att_acc)

    # ------------------------------------------------------------- att tiles
    @pl.when(s < n_att)
    def _():
        dot = _dot4 if q4 else _dot
        k_t = dot(xs_k[:], w2(km)) + offs[OFFK][:, :1]
        v_t = dot(xs_v[:], w2(vm)) + offs[OFFV][:, :1]
        r_t = dot(xs_r[:], w2(rm)) + offs[OFFR][:, :1]

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
        aa_out[0] = f1 * aa + f2 * v_t
        bb_out[0] = f1 * bb + f2
        pp_out[0] = p2

        rwkv_t = (1.0 / (1.0 + jnp.exp(-r_t))) * ywkv
        if q4:
            a2, c = _fold4(rwkv_t * wout_r[0])  # block=tile packing
            att_acc[:] += _dot4(a2, wout[0])
            offs[OUTO] += _bsum(rwkv_t * wout_o[0]) + c
        else:
            att_acc[:] += _dot(rwkv_t * wout_r[0], wout[0])
            offs[OUTO] += _bsum(rwkv_t * wout_o[0])

        @pl.when(s == n_att - 1)
        def _():
            # partial complete: fold the rank-1 offset term and ship
            att_acc[:] += offs[OUTO][:, :1]
            if tp > 1:
                _red_start(att_acc, rs_a, rsa_s, rsa_r)

    # ------------------------------------------------------------- gate init
    @pl.when(s == n_att)
    def _():
        if tp > 1:
            _red_finish(att_acc, rs_a, ag_a, chunk_a,
                        (rsa_s, rsa_r, aga_s, aga_r))
        else:
            xcur[:] += att_acc[:]
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
            xs_fk[:] = ik * fkr[0]
            xs_fr[:] = ir * gr[0]
            offs[FFK] = _bsum(ik * fko[0])
            offs[FFR] = _bsum(ir * go[0])
        offs[FFV] = jnp.zeros_like(offs[FFV])
        vacc[:] = jnp.zeros_like(vacc)

    # ------------------------------------------- ffn tiles (gate rides along)
    @pl.when(jnp.logical_and(s >= n_att, s < S))
    def _():
        j = s - n_att

        @pl.when(j < n_att)
        def _():
            dot = _dot4 if q4 else _dot
            g_t = dot(xs_fr[:], w2(wg)) + offs[FFR][:, :1]
            gate_buf[:, pl.ds(j * tile, tile)] = 1.0 / (1.0 + jnp.exp(-g_t))

            @pl.when(j == n_att - 1)
            def _():
                # gate shard complete: ship now, consumed ~3·n_att ffn
                # steps later — fully hidden behind the value matvecs
                if tp > 1:
                    _gate_start()

        dot = _dot4 if q4 else _dot
        h_t = dot(xs_fk[:], w2(ffnk)) + offs[FFK][:, :1]
        h_t = jnp.maximum(h_t, 0.0)
        h_t = h_t * h_t
        if q4:
            a2, c = _fold4(h_t * fvr[0])  # block=tile packing
            vacc[:] += _dot4(a2, ffnv[0])
            offs[FFV] += _bsum(h_t * fvo[0]) + c
        else:
            vacc[:] += _dot(h_t * fvr[0], ffnv[0])
            offs[FFV] += _bsum(h_t * fvo[0])

        @pl.when(s == S - 1)
        def _():
            vacc[:] += offs[FFV][:, :1]
            if tp > 1:
                _red_start(vacc, rs_v, rsv_s, rsv_r)

    # --------------------------------------------------- ln_out + head tiles
    @pl.when(s == S)  # only reachable on the last layer
    def _():
        _finish_ffn()
        h = _ln(xcur[:], lnout_w[0], lnout_b[0])
        if q4:
            xs_h[:], ch = _fold4(h * hr[0])
            offs[HOF] = _bsum(h * ho[0]) + ch
        else:
            xs_h[:] = h * hr[0]
            offs[HOF] = _bsum(h * ho[0])

    @pl.when(s >= S)
    def _():
        logits_out[:] = ((_dot4 if q4 else _dot)(xs_h[:], hw[:])
                         + offs[HOF][:, :1])


def _fixed_scratch_bytes(n_embd: int, e_loc: int, tp: int, bp: int) -> int:
    """VMEM the kernel holds regardless of tile choice: the f32 activation
    scratch (xcur + 6 xs_* + att_acc + vacc), gate_buf, offs, the exchange
    recv buffers, and the double-buffered xy/dd state windows."""
    b = 9 * bp * n_embd * 4
    b += bp * e_loc * 4                    # gate_buf
    b += 8 * bp * 128 * 4                  # offs
    if tp > 1:
        # 4 reduce-scatter/all-gather buffers + gate_recv [tp, Bp, E/tp]
        # + 2 reduced-chunk staging buffers [Bp, E/tp]
        b += (5 * tp * bp * e_loc + 2 * bp * e_loc) * 4
    b += 8 * bp * n_embd * 4               # xy/dd in+out, double-buffered
    return b


def pick_tp_fused_tile(n_embd: int, e_loc: int, tp: int, bp: int = 8,
                       vmem_budget: int = 15 * 1024 * 1024,
                       q4: bool = False) -> int:
    """Largest 128-multiple tile dividing E_loc that fits VMEM.

    Pallas double-buffers EVERY windowed input, not just the phase that is
    live — all 7 weight streams (km/vm/rm, wout, wg, ffnk, ffnv) coexist:
    14·E·tile bytes, the same rule as decode_stack's pick_tile — plus at
    least one minimal double-buffered head stream (2·E·128) and the fixed
    scratch above. (Measured: the 8·E·tile att-only estimate OOM'd real
    Mosaic at 430M/tp=1 — 18.4M requested of 16M.)

    q4: packed blocks halve the stream bytes but Mosaic materializes
    ~4*E*t of f32 unpack temporaries — net 11*E*t, the single-chip
    pick_tile_q4 model (measured there via scoped-VMEM OOM probes)."""
    fixed = _fixed_scratch_bytes(n_embd, e_loc, tp, bp)
    wcoef = 11 if q4 else 14
    # Full-width local tile first ONLY at small e_loc (measured: the
    # 169M/E=768 full-width tile was the 0.71x -> 0.95x win, but at
    # E=1024 full-width is 23% SLOWER than t=512 — 1,730 vs 2,254 tok/s
    # at B=1, 22.9k vs 28.3k at B=16; fewer, larger grid steps starve
    # the cross-step DMA overlap once the step already streams >=0.5MB).
    # Measured optimum across sizes keeps E*tile ~ 512KB per weight
    # block — the chip's DMA-efficiency plateau (tools/hbm_probe.py):
    # 768*768, 1024*512, 2048*256 (t=512 is 11% slower at 1.5B),
    # 4096*128 all land there; the VMEM budget walk below converges to
    # it naturally once full-width is excluded above e_loc=768.
    # q4 note (measured, tp=1 430M): the packed-block-plateau intuition
    # ("q4 blocks are half the bytes, go one tile notch wider") is WRONG
    # for this kernel — full-width at e_loc=1024 q4 is 2,241 tok/s vs
    # 2,424 at t=512. The TP kernel's overlap structure (gate/exchange
    # scheduling across grid steps) needs the extra steps, same as q8's
    # round-3 "never full-width above e_loc=768" finding. One rule for
    # both formats.
    if e_loc <= 768:
        cands = (e_loc, 512, 384, 256, 128)
    else:
        cands = (512, 384, 256, 128, e_loc)
    for t in cands:
        if (e_loc % t == 0 and t % 128 == 0
                and (wcoef * n_embd * t + 2 * n_embd * 128 + fixed
                     <= vmem_budget)):
            return t
    raise ValueError(
        f"no feasible tile: E={n_embd}, E_loc={e_loc}, tp={tp} "
        f"(fixed scratch {fixed} bytes)"
    )


def pick_tp_head_tile(n_embd: int, tile: int, v_loc: int, *,
                      e_loc: int | None = None, tp: int = 1, bp: int = 8,
                      vmem_budget: int = 15 * 1024 * 1024,
                      q4: bool = False) -> int:
    """Widest 128-multiple divisor of the LOCAL vocab shard whose
    double-buffered blocks fit beside the 7 layer streams + fixed scratch.

    v_loc itself must be a 128 multiple (pad the vocab to a 128*tp
    multiple first — runtime/engine.py does); a misaligned shard would
    only surface as a Mosaic lowering failure on real hardware, so fail
    loudly here instead."""
    if v_loc % 128:
        raise ValueError(
            f"local vocab shard {v_loc} is not a multiple of 128; pad the "
            f"vocab to a multiple of 128*tp (models.rwkv4.pad_vocab)"
        )
    fixed = _fixed_scratch_bytes(n_embd, e_loc or n_embd, tp, bp)
    layer_bytes = (11 if q4 else 14) * n_embd * tile
    hb = (3 * n_embd) // 4 if q4 else 2 * n_embd
    # q4 head tiles past ~1024 cols at E>=2048: Mosaic unpack fusion
    # gives out (single-chip measurement, decode_stack.pick_head_tile)
    ht_cap = 1024 if (q4 and n_embd >= 2048) else v_loc
    # enumerate 128-multiple divisors, widest first (range(v_loc,127,-128)
    # would only visit values congruent to v_loc mod 128)
    for ht in sorted(
            (h for h in range(128, min(v_loc, ht_cap) + 1, 128)
             if v_loc % h == 0),
            reverse=True):
        if layer_bytes + hb * ht + fixed <= vmem_budget:
            return ht
    return 128


def decode_stack_tp(
    x: jax.Array | None,     # [B, E] post-ln0 (replicated); None with
                             # fuse_embed (token gathers ride in-kernel)
    params: RWKVParams,      # LOCAL shards (inside shard_map), signed int8
    state: WKVState,         # xy/dd [L, B, E]; aa/bb/pp [L, B, E/tp]
    decay_loc: jax.Array,    # [L, E/tp] this shard's channels
    bonus_loc: jax.Array,
    *,
    tp: int,
    token: jax.Array | None = None,   # [B] int32 GLOBAL ids (fuse_embed)
    fuse_embed: bool = False,
    tile: int | None = None,
    head_tile: int | None = None,
    interpret=False,
    model_axis: str = "model",
    data_axis: str | None = "data",
    vma: frozenset | None = None,
) -> Tuple[jax.Array, WKVState]:
    """One decode step on this shard, all layers + local head in ONE kernel
    with in-kernel collectives. Returns (logits_loc [B, Vp/tp], new_state).
    Call under shard_map; the caller all-gathers the logits.

    fuse_embed: the vocab-sharded embedding gather, its reduction and ln0
    also run in-kernel (token ids ride as scalar prefetch) — the whole
    token -> local-logits step is one kernel; the logits gather is the
    ONLY XLA collective left. Requires B <= 8 (one emb-row ref per row)."""
    from rwkv_tpu.ops.quant import Quant4Linear

    att, ffn = params.att, params.ffn
    q4 = isinstance(att.key, Quant4Linear)
    if q4:
        fams = (att.key, att.value, att.receptance, att.output,
                ffn.key, ffn.value, ffn.receptance, params.head)
        if not all(isinstance(f, Quant4Linear) for f in fams):
            raise TypeError("4-bit TP decode requires ALL families "
                            "Quant4Linear (quantize_params_q4)")
    elif att.key.w.dtype != jnp.int8:
        raise TypeError("decode_stack_tp requires signed int8 weights")
    wv = (lambda lin: lin.wp) if q4 else (lambda lin: lin.w)
    pretiled = wv(att.key).ndim == 4  # [L, O_loc/t, E(,/2), t] blocks
    L = att.decay.shape[0]
    if fuse_embed:
        if token is None:
            raise ValueError("fuse_embed requires the token array")
        B = token.shape[0]
        E = params.emb.shape[1]
        if B > 8:
            raise ValueError("fuse_embed supports B <= 8")
    else:
        B, E = x.shape
    wcoef = 11 if q4 else 14
    if pretiled:
        # contiguous-block layout (decode_stack.pretile_params, sharded on
        # the block dim): tile is baked into the trailing dim
        pt = wv(att.key).shape[-1]
        if tile is None:
            tile = pt
        elif tile != pt:
            raise ValueError(f"params pretiled for tile={pt}, got {tile}")
        El = wv(att.key).shape[1] * pt
        Fl = wv(ffn.key).shape[1] * pt
        # a baked-in tile chosen by the SINGLE-chip picker can blow the
        # TP kernel's VMEM (the exchange scratch is extra, and the f32
        # activation scratch scales with the padded batch); fail loudly
        # here, not as a Mosaic OOM on hardware
        E_chk = params.emb.shape[1]
        budget = 15 * 1024 * 1024
        bp_chk = max(8, -(-B // 8) * 8)
        need = (wcoef * E_chk * tile + 2 * E_chk * 128
                + _fixed_scratch_bytes(E_chk, El, tp, bp_chk))
        if need > budget:
            raise ValueError(
                f"pretiled tile={tile} needs ~{need} bytes of VMEM with the "
                f"TP exchange scratch at batch {B} (> {budget}); re-pretile "
                f"with pick_tp_fused_tile(E={E_chk}, e_loc={El}, tp={tp}, "
                f"bp={bp_chk})"
            )
    else:
        El = wv(att.key).shape[-1]
        Fl = wv(ffn.key).shape[-1]
        if tile is None:
            bp_pick = max(8, -(-B // 8) * 8)
            # Large-batch 3-D exception (measured, 430M/Bp=32): the
            # 14*E*t model MIS-ranks strided windows at batch — t=512
            # OOMs scoped VMEM by 224KB while the full-width window
            # (nominally 2x bigger) compiles and runs (Mosaic does not
            # double-buffer a window that spans the whole dim — so the
            # 7 weight streams cost 7*E*El single-buffered, not 14*).
            # Prefer full-width where that SINGLE-buffered footprint
            # plus the head stream and the batch-scaled fixed scratch
            # fits the budget; batch-serving perf users should pretile
            # instead (engine does: +~4% over this and VMEM-predictable).
            fw_need = ((7 * E * El) // (2 if q4 else 1) + 2 * E * 128
                       + _fixed_scratch_bytes(E, El, tp, bp_pick))
            if bp_pick > 16 and fw_need <= 15 * 1024 * 1024:
                tile = El
            else:
                tile = pick_tp_fused_tile(E, El, tp, bp=bp_pick, q4=q4)
    if q4:
        if att.output.block != tile or ffn.value.block != tile:
            raise ValueError(
                f"4-bit row-tiled families packed with block="
                f"{att.output.block}/{ffn.value.block} but TP kernel tile "
                f"is {tile}; requantize with quantize_params_q4(tile={tile})"
            )
    Vl = wv(params.head).shape[-1]
    assert El % tile == 0 and Fl % tile == 0, (El, Fl, tile)
    n_att, n_ffn = El // tile, Fl // tile
    assert n_ffn >= n_att, "gate tiles ride the first ffn steps (F = 4E)"
    S = n_att + n_ffn
    if head_tile is None:
        head_tile = pick_tp_head_tile(E, tile, Vl, e_loc=El, tp=tp, q4=q4)
    assert Vl % head_tile == 0, (Vl, head_tile)
    n_head = Vl // head_tile

    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        if not fuse_embed:
            x = jnp.pad(x, ((0, Bp - B), (0, 0)))
        state = WKVState(
            *(jnp.pad(s_, ((0, 0), (0, Bp - B), (0, 0))) for s_ in state)
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

    def r3(a):
        return a.reshape(a.shape[0], 1, a.shape[1])

    # index maps take *a: with fuse_embed the scalar-prefetch refs (rel,
    # mine) are appended to every signature; the grid step is always a[0]
    def row(width):
        return pl.BlockSpec((1, 1, width), lambda *a: (_l(a[0]), 0, 0),
                            memory_space=pltpu.VMEM)

    att_vec = pl.BlockSpec((1, 1, tile), lambda *a: (_l(a[0]), 0, j_att(a[0])),
                           memory_space=pltpu.VMEM)
    ffn_vec = pl.BlockSpec((1, 1, tile), lambda *a: (_l(a[0]), 0, j_ffn(a[0])),
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
        return pl.BlockSpec((1, Ew, tile), lambda *a: (_l(a[0]), 0, jm(a[0])),
                            memory_space=pltpu.VMEM)

    def rowT(jm):
        return pl.BlockSpec((1, tw, E), lambda *a: (_l(a[0]), jm(a[0]), 0),
                            memory_space=pltpu.VMEM)

    r2 = lambda a: a.reshape(1, a.shape[0])  # noqa: E731

    if fuse_embed:
        # one gathered emb-row block per batch element (its block index is
        # the scalar-prefetched LOCAL row id), then ln0 w/b
        def emb_spec(b):
            return pl.BlockSpec(
                (1, 1, E), lambda t, rel, mine, b=b: (rel[b], 0, 0),
                memory_space=pltpu.VMEM)

        x_specs = [emb_spec(b) for b in range(B)] + [
            pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        x_specs = [
            pl.BlockSpec((Bp, E), lambda *a: (0, 0), memory_space=pltpu.VMEM)
        ]
    in_specs = x_specs + [
        row(E), row(E), row(E), row(E),                   # ln1/ln2 w,b
        row(E), row(E), row(E), row(E), row(E),           # mixes
        row(E), row(E), row(E), row(E), row(E), row(E),   # kr vr rr ko vo ro
        row(E), row(E), row(E), row(E),                   # fkr fko gr go
        att_vec, att_vec,                                  # decay, bonus
        full_state, full_state,                            # xy, dd
        chan_state, chan_state, chan_state,                # aa bb pp
        colT(j_att), colT(j_att), colT(j_att),             # km vm rm
        rowT(j_att), att_vec, att_vec,                     # wout, wout_r/o
        colT(j_gate),                                      # wg
        colT(j_ffn),                                       # ffnk
        rowT(j_ffn), ffn_vec, ffn_vec,                     # ffnv, fvr, fvo
        pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Ew, head_tile), lambda *a: (0, j_head(a[0])),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, E), lambda *a: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
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
        pl.BlockSpec((Bp, head_tile), lambda *a: (0, j_head(a[0])),
                     memory_space=pltpu.VMEM),
    )
    sds = functools.partial(jax.ShapeDtypeStruct, dtype=f32, vma=vma)
    out_shape = (
        sds((L, Bp, E)), sds((L, Bp, E)),
        sds((L, Bp, El)), sds((L, Bp, El)), sds((L, Bp, El)),
        sds((Bp, Vl)),
    )

    if fuse_embed:
        Vrows = params.emb.shape[0]
        emb3 = params.emb.reshape(Vrows, 1, E)
        x_ops = [emb3] * B + [r2(params.ln0.weight), r2(params.ln0.bias)]
    else:
        x_ops = [x]
    operands = x_ops + [
        r3(params.ln1.weight), r3(params.ln1.bias),
        r3(params.ln2.weight), r3(params.ln2.bias),
        r3(att.mix_k), r3(att.mix_v), r3(att.mix_r),
        r3(ffn.mix_k), r3(ffn.mix_r),
        r3(att.key.scale), r3(att.value.scale), r3(att.receptance.scale),
        r3(att.key.offset), r3(att.value.offset), r3(att.receptance.offset),
        r3(ffn.key.scale), r3(ffn.key.offset),
        r3(ffn.receptance.scale), r3(ffn.receptance.offset),
        r3(decay_loc), r3(bonus_loc),
        state.xy, state.dd,
        state.aa, state.bb, state.pp,
        wv(att.key), wv(att.value), wv(att.receptance),
        wv(att.output), r3(att.output.scale), r3(att.output.offset),
        wv(ffn.receptance),
        wv(ffn.key),
        wv(ffn.value), r3(ffn.value.scale), r3(ffn.value.offset),
        r2(params.ln_out.weight), r2(params.ln_out.bias),
        wv(params.head), r2(params.head.scale), r2(params.head.offset),
    ]

    # xcur + 6 xs_* + att_acc + vacc = 9 [Bp, E] f32 buffers
    scratch = [pltpu.VMEM((Bp, E), f32) for _ in range(9)]
    scratch += [pltpu.VMEM((Bp, El), f32)]                  # gate_buf
    scratch += [pltpu.VMEM((8, Bp, 128), f32)]              # offs
    if tp > 1:
        scratch += [pltpu.VMEM((tp, Bp, El), f32)           # rs_a, ag_a,
                    for _ in range(5)]                      # rs_v, ag_v,
        scratch += [pltpu.VMEM((Bp, El), f32)               # gate_recv
                    for _ in range(2)]                      # chunk_a/v
        scratch += [pltpu.SemaphoreType.DMA(()) for _ in range(10)]

    kernel = functools.partial(
        _decode_stack_tp_kernel,
        tp=tp, n_att=n_att, n_ffn=n_ffn, tile=tile, n_layer=L, n_head=n_head,
        model_axis=model_axis, data_axis=data_axis,
        fuse_embed=(B if fuse_embed else 0), pretiled=pretiled, q4=q4,
    )
    wfb = L * (3 * E * El + El * E + E * El + E * Fl + Fl * E) + E * Vl
    weight_bytes = wfb // 2 if q4 else wfb
    cost = pl.CostEstimate(
        flops=2 * Bp * wfb,
        bytes_accessed=weight_bytes,
        transcendentals=L * Bp * (4 * El + Fl),
    )
    cparams = pltpu.CompilerParams(
        has_side_effects=True, collective_id=0,
    ) if tp > 1 else None
    if fuse_embed:
        # local row id + in-shard mask per batch element, precomputed here
        # (index maps cannot call axis_index); clamp like XLA's gather
        Vrows = params.emb.shape[0]
        tokc = jnp.asarray(token, jnp.int32)
        if tp > 1:
            lo = jax.lax.axis_index(model_axis) * Vrows
        else:
            lo = 0
        rel = jnp.clip(tokc - lo, 0, Vrows - 1)
        mine = ((tokc >= lo) & (tokc < lo + Vrows)).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L * S + n_head,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=cparams,
            cost_estimate=cost,
        )(rel, mine, *operands)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(L * S + n_head,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cparams,
            cost_estimate=cost,
        )(*operands)

    xy, dd, aa, bb, pp = outs[:5]
    logits_loc = outs[5][:B]
    new_state = WKVState(xy=xy[:, :B], aa=aa[:, :B], bb=bb[:, :B],
                         pp=pp[:, :B], dd=dd[:, :B])
    return logits_loc, new_state
