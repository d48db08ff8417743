"""Manual shard_map tensor-parallel decode step — Megatron-minimal
communication.

The GSPMD path (shard the params, jit the plain forward) is correct but
compiles ~8 collectives per block: it reduces the rank-1 quant-offset
partials separately from the main matmul psums and re-gathers
intermediates (pinned in tests/test_sharding.py). This module is the
hand-scheduled alternative: every offset partial is folded into its
matmul's psum (sum-of-partials == partial-of-sum), giving exactly

    per block : 2 psums  ([B, E] f32: att out-projection, ffn value)
                + 1 all-gather ([B, E] sigmoid gate, column-parallel)
    per token : + 1 psum (vocab-sharded embedding gather)
                + 1 all-gather (vocab-sharded logits)

i.e. 3L + 2 collectives per token (pinned in tests/test_tp_step.py),
vs ~8L for the GSPMD path. Uses the SAME param/state shardings as
parallel/sharding.py, so an engine can switch step functions without
resharding anything.

Layout recap (parallel/sharding.py): k/v/r, ffn.key, ffn.receptance and
the head are column-parallel (offset vectors replicated — the offset adds
to every output equally, so it stays local); att.output and ffn.value are
row-parallel (scale/offset shard with the contracted dim — the offset
partial rides the main psum). decay/bonus are replicated and sliced to
this shard's channel block with `axis_index`; the WKV recurrence itself
is elementwise over channels and communicates nothing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rwkv_tpu.models.rwkv4 import RWKVParams, WKVState
from rwkv_tpu.ops.layernorm import layer_norm
from rwkv_tpu.ops.quant import QuantLinear, qmatmul
from rwkv_tpu.ops.wkv import WKVChannelState, wkv_step
from rwkv_tpu.parallel.sharding import param_pspecs, state_pspecs

# Typed collective: an all-gather whose result is *invariant* (identical on
# every shard) — exactly what the gate/logits gathers produce. Under
# jax.shard_map's varying-manual-axes checking (check_vma=True) the plain
# jax.lax.all_gather types its result as model-varying, which would poison
# the scan carry and every replicated output downstream; the invariant form
# keeps the whole step body check_vma-clean with zero pvary annotations.
try:  # pragma: no cover - future public home
    from jax.lax import all_gather_invariant as _all_gather_inv  # type: ignore
    _CHECK_VMA = True
except ImportError:  # pragma: no cover
    try:
        from jax._src.lax.parallel import (  # noqa: F401
            all_gather_invariant as _all_gather_inv,
        )
        _CHECK_VMA = True
    except ImportError:
        from jax.lax import all_gather as _all_gather_inv
        _CHECK_VMA = False  # plain all_gather types as varying


def _anyqmm(a, lin, compute_dtype=jnp.float32):
    """qmatmul for QuantLinear, q4matmul for Quant4Linear (the 4-bit
    families carry their pack-block tag; local shards hold whole pack
    blocks because the tile divides E/tp)."""
    from rwkv_tpu.ops.quant import Quant4Linear, q4matmul

    if isinstance(lin, Quant4Linear):
        return q4matmul(a, lin, compute_dtype=compute_dtype)
    return qmatmul(a, lin, compute_dtype=compute_dtype)


def _qdot_col(x_full, lin):
    """Column-parallel quantized matvec: local [B, O/tp], no comm.
    scale/offset are replicated (indexed by the full contracted dim).
    Delegates to ops.quant.qmatmul so precision semantics (HIGHEST at
    decode) match the forward_step path exactly."""
    return _anyqmm(x_full, lin)


def _qdot_row_partial(x_loc, lin):
    """Row-parallel quantized matvec PARTIAL: scale/offset are sharded with
    the contracted dim, so qmatmul on the local shard computes both the
    main partial and the rank-1 offset partial — the caller's psum reduces
    them in one collective (sum-of-partials == partial-of-sum)."""
    return qmatmul(x_loc, lin)


def _local_slice(vec_full, n_shards, axis_name):
    """This shard's channel block of a replicated per-channel vector."""
    if n_shards == 1:
        return vec_full
    size = vec_full.shape[-1] // n_shards
    i = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(vec_full, i * size, size, axis=-1)


# tp=1 collective elision (round 4): on a model=1 mesh every model-axis
# psum/gather is an identity, but leaving them in the traced program costs
# ~7% prefill throughput — XLA lowers the size-1 collectives to copies
# that break fusion across each block boundary (BENCH_NOTES round-3:
# 112.5k vs 120.4k tok/s at 430M bf16). The bodies take every collective
# through these wrappers so a model=1 mesh traces the SAME program as the
# plain path; param specs are replicated at tp=1 (make_tp_step /
# make_tp_prefill) so check_vma sees nothing model-varying.
def _psum_tp(x, ax, n_model):
    return x if n_model == 1 else jax.lax.psum(x, ax)


def _gather_tp(x, ax, n_model):
    return x if n_model == 1 else _all_gather_inv(x, ax, axis=-1, tiled=True)


def _embed_psum(params, token, ax, n_model=0):
    """Vocab-sharded embedding gather -> one psum + ln0. token: [B] for a
    decode step or [T, B] for prefill (any leading shape works)."""
    if n_model == 1:  # full vocab resident: plain lookup, no collective
        x = params.emb[token]
        return layer_norm(x.astype(jnp.float32), params.ln0.weight,
                          params.ln0.bias)
    Vl = params.emb.shape[0]  # vocab-sharded rows
    i = jax.lax.axis_index(ax)
    lo = i * Vl
    rel = jnp.clip(token - lo, 0, Vl - 1)
    rows = params.emb[rel]                                  # [..., E]
    mine = ((token >= lo) & (token < lo + Vl))[..., None]
    x = jax.lax.psum(jnp.where(mine, rows, 0.0), ax)
    return layer_norm(x.astype(jnp.float32), params.ln0.weight,
                      params.ln0.bias)


def _tp_step_local(params, token, state, *, n_model: int):
    """The per-shard body (XLA matvecs). All inputs are LOCAL shards."""
    ax = "model"
    x = _embed_psum(params, token, ax, n_model)

    def block(x, layer):
        (ln1, ln2, att, ffn), (xy, aa, bb, pp, dd) = layer
        xx = layer_norm(x, ln1.weight, ln1.bias)
        ik = att.mix_k * xx + (1 - att.mix_k) * xy
        iv = att.mix_v * xx + (1 - att.mix_v) * xy
        ir = att.mix_r * xx + (1 - att.mix_r) * xy
        k = _qdot_col(ik, att.key)          # [B, E/tp] channel shard
        v = _qdot_col(iv, att.value)
        r = _qdot_col(ir, att.receptance)
        w_loc = _local_slice(att.decay, n_model, ax)
        u_loc = _local_slice(att.bonus, n_model, ax)
        y, chan = wkv_step(k, v, WKVChannelState(aa, bb, pp), w_loc, u_loc)
        rwkv = jax.nn.sigmoid(r) * y        # [B, E/tp]
        # row-parallel out-projection: offset folded, ONE psum
        x = x + _psum_tp(_qdot_row_partial(rwkv, att.output), ax, n_model)

        xx2 = layer_norm(x, ln2.weight, ln2.bias)
        fk = ffn.mix_k * xx2 + (1 - ffn.mix_k) * dd
        fr = ffn.mix_r * xx2 + (1 - ffn.mix_r) * dd
        gate_loc = jax.nn.sigmoid(_qdot_col(fr, ffn.receptance))  # [B, E/tp]
        h = jnp.square(jax.nn.relu(_qdot_col(fk, ffn.key)))       # [B, F/tp]
        vfull = _psum_tp(_qdot_row_partial(h, ffn.value), ax, n_model)
        gate = _gather_tp(gate_loc, ax, n_model)
        x = x + gate * vfull
        return x, WKVState(xx, chan.aa, chan.bb, chan.pp, xx2)

    per_layer = ((params.ln1, params.ln2, params.att, params.ffn),
                 tuple(state))
    x, new_state = jax.lax.scan(block, x, per_layer)

    h = layer_norm(x, params.ln_out.weight, params.ln_out.bias)
    logits_loc = _qdot_col(h, params.head)          # [B, Vp/tp]
    if params.logit_bias is not None:
        logits_loc = logits_loc + params.logit_bias
    logits = _gather_tp(logits_loc, ax, n_model)
    return logits, WKVState(*new_state)


def _tp_step_local_pallas(params, token, state, *, n_model: int,
                          tile: int | None, interpret: bool):
    """The per-shard body with fused Pallas kernels (ops/pallas/tp_halves):
    everything between two collectives is ONE kernel, so sharded decode
    keeps the single-chip kernel's HBM-streaming efficiency. Same layouts,
    same 3L+2 collective schedule as the XLA body (pinned in tests)."""
    from rwkv_tpu.ops.pallas.mm8 import mm8
    from rwkv_tpu.ops.pallas.tp_halves import att_half, ffn_half

    ax = "model"
    x = _embed_psum(params, token, ax, n_model)

    A, F = params.att, params.ffn
    L = A.decay.shape[0]
    decay_loc = _local_slice(A.decay, n_model, ax)   # [L, E/tp]
    bonus_loc = _local_slice(A.bonus, n_model, ax)
    # This body runs under check_vma=False (see make_tp_step); Pallas
    # outputs need no varying-axes declaration there.
    vma = None

    def block(x, per_layer):
        l, (xy, aa, bb, pp, dd) = per_layer
        partial, aa2, bb2, pp2 = att_half(
            l, x, xy,
            params.ln1.weight, params.ln1.bias, A.mix_k, A.mix_v, A.mix_r,
            A.key.scale, A.value.scale, A.receptance.scale,
            A.key.offset, A.value.offset, A.receptance.offset,
            A.key.w, A.value.w, A.receptance.w,
            A.output.w, A.output.scale, A.output.offset,
            decay_loc, bonus_loc, aa, bb, pp,
            tile=tile, interpret=interpret, vma=vma,
        )
        # the new token-shift memory is replicated — recomputed here (one
        # XLA fusion) rather than emitted from the model-varying kernel
        xx = layer_norm(x, params.ln1.weight[l], params.ln1.bias[l])
        x = x + _psum_tp(partial, ax, n_model)          # psum 1

        vpart, gate_loc = ffn_half(
            l, x, dd,
            params.ln2.weight, params.ln2.bias, F.mix_k, F.mix_r,
            F.key.scale, F.key.offset,
            F.receptance.scale, F.receptance.offset,
            F.key.w, F.receptance.w, F.value.w,
            F.value.scale, F.value.offset,
            tile=tile, interpret=interpret, vma=vma,
        )
        xx2 = layer_norm(x, params.ln2.weight[l], params.ln2.bias[l])
        # independent collectives — XLA's async scheduler may overlap them
        vfull = _psum_tp(vpart, ax, n_model)            # psum 2
        gate = _gather_tp(gate_loc, ax, n_model)
        x = x + gate * vfull
        return x, WKVState(xx, aa2, bb2, pp2, xx2)

    x, new_state = jax.lax.scan(
        block, x, (jnp.arange(L, dtype=jnp.int32), tuple(state))
    )

    h = layer_norm(x, params.ln_out.weight, params.ln_out.bias)
    logits_loc = (mm8(h * params.head.scale, params.head.w,
                      interpret=interpret, vma=vma)
                  + (h @ params.head.offset)[:, None])  # [B, Vp/tp]
    if params.logit_bias is not None:
        logits_loc = logits_loc + params.logit_bias
    logits = _gather_tp(logits_loc, ax, n_model)
    return logits, WKVState(*new_state)


def _tp_step_local_fused(params, token, state, *, n_model: int,
                         tile: int | None, interpret):
    """The per-shard body as ONE Pallas kernel for the whole stack with
    in-kernel RDMA collectives (ops/pallas/decode_stack_tp.py). At B <= 8
    even the vocab-sharded embedding gather + reduce + ln0 ride in-kernel,
    leaving the final logits gather as the ONLY XLA collective per token;
    larger batches fall back to the XLA embed psum."""
    from rwkv_tpu.ops.pallas.decode_stack_tp import decode_stack_tp

    ax = "model"
    decay_loc = _local_slice(params.att.decay, n_model, ax)
    bonus_loc = _local_slice(params.att.bonus, n_model, ax)
    fuse = token.shape[0] <= 8
    if fuse:
        x = None
    else:
        x = _embed_psum(params, token, ax, n_model)
    logits_loc, new_state = decode_stack_tp(
        x, params, state, decay_loc, bonus_loc,
        tp=n_model, token=token if fuse else None, fuse_embed=fuse,
        tile=tile, interpret=interpret,
    )
    if params.logit_bias is not None:
        logits_loc = logits_loc + params.logit_bias
    logits = _gather_tp(logits_loc, ax, n_model)
    return logits, new_state


def make_tp_step(mesh: Mesh, params: RWKVParams, *, body: str | None = None,
                 tile: int | None = None, interpret: bool | None = None,
                 jit: bool = True):
    """Build a (params, token, state) -> (logits, state) decode step running
    under shard_map with the layouts of parallel/sharding.py and 3L + 2
    collectives per token. token: [B] int32 (B sharded over 'data');
    state leaves [L, B, E].

    body: 'pallas' runs each per-shard block half as one fused Pallas
    kernel (single-chip kernel efficiency between collectives; requires
    SIGNED int8 weights — models.rwkv4.signedize_params — and a local
    channel width E/tp that is a multiple of 128). 'fused' goes further:
    the WHOLE stack is one kernel per chip with in-kernel RDMA
    collectives (decode_stack_tp; same eligibility). 'xla' uses plain
    qmatmul matvecs. None auto-selects pallas when eligible.
    interpret: run the Pallas kernels in interpreter mode (None = auto:
    on for CPU backends, e.g. the virtual test mesh).
    jit: wrap in jax.jit (False lets the engine compose sampling into the
    same device program before jitting).
    """
    from rwkv_tpu.ops.quant import Quant4Linear

    tp = mesh.shape["model"]
    q4 = isinstance(params.att.key, Quant4Linear)
    if q4:
        if not isinstance(params.head, Quant4Linear):
            raise TypeError("4-bit tp_step requires a Quant4Linear head "
                            "(quantize_params_q4 covers it)")
    elif not isinstance(params.head, QuantLinear) or not isinstance(
            params.att.key, QuantLinear):
        raise TypeError("tp_step requires quantized params "
                        "(models.rwkv4.quantize_params)")
    wv = (lambda lin: lin.wp) if q4 else (lambda lin: lin.w)
    V = params.emb.shape[0]
    if V % tp or wv(params.head).shape[-1] % tp:
        raise ValueError(
            f"tp_step needs the (padded) vocab divisible by model={tp}; "
            f"apply models.rwkv4.pad_vocab first (got {V})"
        )
    E = params.emb.shape[1]
    ndimw = wv(params.att.key).ndim
    pallas_ok = (
        wv(params.att.key).dtype == jnp.int8
        and ndimw in (3, 4)
        and E % tp == 0
        and (E // tp) % 128 == 0
        # pretiled [L, O/t, E, t]: the block dim must shard evenly
        and (ndimw == 3 or wv(params.att.key).shape[1] % tp == 0)
    )
    if q4 and body in ("xla", "pallas"):
        raise ValueError(
            "4-bit params run only through body='fused' (the xla/pallas "
            "bodies stream Q8); quantize with quantize_params for those")
    if q4 and body is None and not pallas_ok:
        raise ValueError(
            f"4-bit tp_step needs E/tp lane-aligned (E={E}, tp={tp})")
    if q4:
        body = "fused"
    if body is None:
        if pallas_ok:
            # On a real TPU backend the in-kernel-collective whole-stack
            # kernel is the measured-best body (0.95-0.995x the
            # single-chip kernel at tp=1, BENCH_NOTES); on CPU backends
            # its RDMA simulation (InterpretParams) is far too slow for
            # routine runs, so the half-kernel body serves there.
            # Pretiled 4-D params only run through the fused kernel.
            on_tpu = jax.default_backend() != "cpu"
            body = "fused" if (on_tpu or ndimw == 4) else "pallas"
        else:
            body = "xla"
    if body == "pallas" and ndimw == 4:
        raise ValueError("body='pallas' needs the 3-D weight layout; "
                         "pretiled params run with body='fused'")
    if body in ("pallas", "fused"):
        if not pallas_ok:
            raise ValueError(
                f"body={body!r} requires signed int8 weights "
                "(models.rwkv4.signedize_params) and E/tp a multiple of "
                f"128 (got dtype={wv(params.att.key).dtype}, E={E}, "
                f"tp={tp})"
            )
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        if body == "fused":
            if interpret is True:
                # in-kernel RDMAs need the TPU-interpreter simulation, not
                # the plain HLO interpreter
                from jax.experimental.pallas import tpu as pltpu

                interpret = pltpu.InterpretParams()
            fn = functools.partial(_tp_step_local_fused, n_model=tp,
                                   tile=tile, interpret=interpret)
        else:
            fn = functools.partial(_tp_step_local_pallas, n_model=tp,
                                   tile=tile, interpret=interpret)
    elif body == "xla":
        fn = functools.partial(_tp_step_local, n_model=tp)
    else:
        raise ValueError(
            f"unknown body {body!r} (want 'xla', 'pallas' or 'fused')")
    # tp=1: replicated param specs — the bodies elide every model-axis
    # collective (identity on a 1-wide axis), so nothing may be typed
    # model-varying; on one shard "replicated" and "model-sharded" are the
    # same arrays, so no resharding happens at the boundary.
    pspecs = (jax.tree.map(lambda _: P(), params) if tp == 1
              else param_pspecs(params, n_model=tp))
    sspecs = state_pspecs(batched=True, n_model=tp)
    # check_vma stays ON for the XLA body. The Pallas bodies must disable
    # it: pallas_call's interpret-mode lowering (the virtual-mesh test
    # path) re-evaluates block fetches with mixed-vma operands and fails
    # with "Primitive dynamic_slice requires varying manual axes to match,
    # but got [frozenset({'model'}), frozenset(), ...]. Please open an
    # issue at github.com/jax-ml/jax/issues and as a temporary workaround
    # pass the check_vma=False argument to `jax.shard_map`".
    # RETESTED on jax 0.9.0 (2026-08-17, round 3): still fails even with
    # full vma= annotations on every pallas output — the failure is inside
    # the interpret lowering's own block-index slicing, not our
    # annotations; jax's error text itself names check_vma=False as the
    # sanctioned workaround (upstream tracker unreachable from this env:
    # zero egress). Re-run the probe on each jax upgrade:
    # the typed program is identical either way; parity + collective-count
    # tests cover both Pallas bodies at tp=2/tp=4 and data=2.
    sm = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P("data"), sspecs),
        out_specs=(P("data", None), sspecs),
        check_vma=_CHECK_VMA and body == "xla",
    )
    return jax.jit(sm) if jit else sm


def _tp_seq_local(params, tokens, state, length, *, n_model: int,
                  compute_dtype):
    """Per-shard BATCHED PREFILL body: [T, B] tokens through the parallel
    WKV scan with the SAME layouts and minimal collective schedule as the
    decode step (2 psums + 1 gather per block, +1 embed psum +1 logits
    gather per call — amortized over all T tokens, vs the GSPMD prefill's
    ~8 collectives per block). The WKV associative scan is elementwise
    over channels, so it runs fully sharded with zero communication.
    length: [B] ragged valid-token counts (padding positions are no-ops),
    or None — every lane full — which drops the mask/carry-select ops
    entirely (the FULL-CHUNK fast path: ~15-20% faster on chip, measured
    in tools/prefill_overhead_probe.py; callers dispatch it per chunk
    from host-known lengths)."""
    from rwkv_tpu.models.rwkv4 import _carry_valid, _last_valid
    from rwkv_tpu.ops.wkv import wkv_parallel

    ax = "model"
    x = _embed_psum(params, tokens, ax, n_model)         # [T, B, E]

    T = x.shape[0]
    mask = (None if length is None
            else jnp.arange(T)[:, None] < length[None, :])   # [T, B]
    decay_loc = _local_slice(params.att.decay, n_model, ax)
    bonus_loc = _local_slice(params.att.bonus, n_model, ax)

    def mm(a, lin):
        return _anyqmm(a, lin, compute_dtype=compute_dtype)

    def block(x, layer):
        (ln1, ln2, att, ffn, w_loc, u_loc), (xy, aa, bb, pp, dd) = layer
        xx = layer_norm(x, ln1.weight, ln1.bias)
        prev = jnp.concatenate([xy[None], xx[:-1]], axis=0)
        k = mm(att.mix_k * xx + (1 - att.mix_k) * prev, att.key)
        v = mm(att.mix_v * xx + (1 - att.mix_v) * prev, att.value)
        r = mm(att.mix_r * xx + (1 - att.mix_r) * prev, att.receptance)
        y, chan = wkv_parallel(k, v, WKVChannelState(aa, bb, pp),
                               w_loc, u_loc, mask)
        rwkv = jax.nn.sigmoid(r) * y
        x = x + _psum_tp(mm(rwkv, att.output), ax, n_model)  # psum 1
        new_xy = _carry_valid(_last_valid(xx, length), xy, length)

        xx2 = layer_norm(x, ln2.weight, ln2.bias)
        prev2 = jnp.concatenate([dd[None], xx2[:-1]], axis=0)
        fk = ffn.mix_k * xx2 + (1 - ffn.mix_k) * prev2
        fr = ffn.mix_r * xx2 + (1 - ffn.mix_r) * prev2
        gate_loc = jax.nn.sigmoid(mm(fr, ffn.receptance))
        h = jnp.square(jax.nn.relu(mm(fk, ffn.key)))
        vfull = _psum_tp(mm(h, ffn.value), ax, n_model)      # psum 2
        gate = _gather_tp(gate_loc, ax, n_model)
        x = x + gate * vfull
        new_dd = _carry_valid(_last_valid(xx2, length), dd, length)
        return x, WKVState(new_xy, chan.aa, chan.bb, chan.pp, new_dd)

    per_layer = ((params.ln1, params.ln2, params.att, params.ffn,
                  decay_loc, bonus_loc), tuple(state))
    x, new_state = jax.lax.scan(block, x, per_layer)

    h = layer_norm(_last_valid(x, length),
                   params.ln_out.weight, params.ln_out.bias)
    logits_loc = _qdot_col(h, params.head)
    if params.logit_bias is not None:
        logits_loc = logits_loc + params.logit_bias
    logits = _gather_tp(logits_loc, ax, n_model)
    return logits, WKVState(*new_state)


def make_tp_prefill(mesh: Mesh, params: RWKVParams, *,
                    compute_dtype=jnp.float32, jit: bool = True,
                    masked: bool = True):
    """(params, tokens [T, B], state, length [B]) -> (logits [B, Vp],
    state) batched ragged prefill under shard_map with the minimal
    collective schedule. Same param/state layouts as make_tp_step, so an
    engine mixes TP prefill and TP decode on one resident state pool.

    masked=False builds the FULL-CHUNK variant — (params, tokens, state)
    with no length arg, every lane assumed full — which elides the ragged
    mask/carry-select ops (~15-20% faster; prefill_overhead_probe)."""
    from rwkv_tpu.ops.quant import Quant4Linear

    tp = mesh.shape["model"]
    if not isinstance(params.att.key, (QuantLinear, Quant4Linear)):
        raise TypeError("tp prefill requires quantized params")
    V = params.emb.shape[0]
    if V % tp:
        raise ValueError(f"padded vocab {V} not divisible by model={tp}")
    pspecs = (jax.tree.map(lambda _: P(), params) if tp == 1
              else param_pspecs(params, n_model=tp))  # see make_tp_step
    sspecs = state_pspecs(batched=True, n_model=tp)
    fn = functools.partial(_tp_seq_local, n_model=tp,
                           compute_dtype=compute_dtype)
    if masked:
        in_specs = (pspecs, P(None, "data"), sspecs, P("data"))
    else:
        fn = functools.partial(fn, length=None)
        in_specs = (pspecs, P(None, "data"), sspecs)
    sm = jax.shard_map(
        fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=(P("data", None), sspecs),
        check_vma=_CHECK_VMA,
    )
    return jax.jit(sm) if jit else sm


def make_engine_prefill(mesh: Mesh, params: RWKVParams, *,
                        compute_dtype=jnp.float32):
    """forward_seq-shape-compatible adapter over make_tp_prefill for the
    engine's prefill jits: tokens [T] or [T, B]; state leaves [L, E] or
    [L, B, E]; scalar or [B] length; B padded to the data axis.

    length=None dispatches the unmasked FULL-CHUNK program (every lane
    carries exactly T valid tokens); batch-pad lanes then compute garbage
    that is sliced away below — safe because their states/logits are
    discarded, and callers only pass None when all REAL lanes are full."""
    sm = make_tp_prefill(mesh, params, compute_dtype=compute_dtype,
                         jit=False)
    sm_full = make_tp_prefill(mesh, params, compute_dtype=compute_dtype,
                              jit=False, masked=False)
    nd = mesh.shape["data"]

    def prefill(params, tokens, state, length):
        unb = tokens.ndim == 1
        if unb:
            tokens = tokens[:, None]
            state = jax.tree.map(lambda s: s[:, None], state)
        B = tokens.shape[1]
        if length is not None:
            length = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (B,))
        Bp = -(-B // nd) * nd
        if Bp != B:
            tokens = jnp.pad(tokens, ((0, 0), (0, Bp - B)))
            state = jax.tree.map(
                lambda s: jnp.pad(s, ((0, 0), (0, Bp - B), (0, 0))), state)
            if length is not None:
                length = jnp.pad(length, (0, Bp - B))
        if length is None:
            logits, st = sm_full(params, tokens, state)
        else:
            logits, st = sm(params, tokens, state, length)
        if Bp != B:
            logits = logits[:B]
            st = jax.tree.map(lambda s: s[:, :B], st)
        if unb:
            logits = logits[0]
            st = jax.tree.map(lambda s: s[:, 0], st)
        return logits, st

    return prefill


def make_engine_step(mesh: Mesh, params: RWKVParams, **kw):
    """A tp_step with models.rwkv4.forward_step-compatible shapes, for the
    engine's decode jits: token scalar or [B], state leaves [L, E] or
    [L, B, E]; B is padded up to a multiple of the 'data' axis (shard_map
    needs the global batch divisible — padded streams compute discarded
    garbage on zero state). NOT jitted: the engine composes sampling into
    the same device program before jitting (runtime/engine.py)."""
    sm = make_tp_step(mesh, params, jit=False, **kw)
    nd = mesh.shape["data"]

    def step(params, token, state):
        unb = token.ndim == 0
        if unb:
            token = token[None]
            state = jax.tree.map(lambda s: s[:, None], state)
        B = token.shape[0]
        Bp = -(-B // nd) * nd
        if Bp != B:
            token = jnp.pad(token, (0, Bp - B))
            state = jax.tree.map(
                lambda s: jnp.pad(s, ((0, 0), (0, Bp - B), (0, 0))), state
            )
        logits, st = sm(params, token, state)
        if Bp != B:
            logits = logits[:B]
            st = jax.tree.map(lambda s: s[:, :B], st)
        if unb:
            logits = logits[0]
            st = jax.tree.map(lambda s: s[:, 0], st)
        return logits, st

    return step
