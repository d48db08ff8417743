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


def _qdot_col(x_full, lin):
    """Column-parallel quantized matvec: local [B, O/tp], no comm.
    scale/offset are replicated (indexed by the full contracted dim).
    Delegates to ops.quant.qmatmul so precision semantics (HIGHEST at
    decode) match the forward_step path exactly."""
    return qmatmul(x_full, lin)


def _qdot_row_partial(x_loc, lin):
    """Row-parallel quantized matvec PARTIAL: scale/offset are sharded with
    the contracted dim, so qmatmul on the local shard computes both the
    main partial and the rank-1 offset partial — the caller's psum reduces
    them in one collective (sum-of-partials == partial-of-sum)."""
    return qmatmul(x_loc, lin)


def _local_slice(vec_full, n_shards, axis_name):
    """This shard's channel block of a replicated per-channel vector."""
    size = vec_full.shape[-1] // n_shards
    i = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(vec_full, i * size, size, axis=-1)


def _tp_step_local(params, token, state, *, n_model: int):
    """The per-shard body. All inputs are LOCAL shards (shard_map)."""
    ax = "model"
    Vl = params.emb.shape[0]  # vocab-sharded rows

    # ---- embedding: vocab-sharded gather -> one [B, E] psum -------------
    i = jax.lax.axis_index(ax)
    lo = i * Vl
    rel = jnp.clip(token - lo, 0, Vl - 1)
    rows = params.emb[rel]                                  # [B, E]
    mine = ((token >= lo) & (token < lo + Vl))[:, None]
    x = jax.lax.psum(jnp.where(mine, rows, 0.0), ax)
    x = layer_norm(x.astype(jnp.float32), params.ln0.weight, params.ln0.bias)

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
        x = x + jax.lax.psum(_qdot_row_partial(rwkv, att.output), ax)

        xx2 = layer_norm(x, ln2.weight, ln2.bias)
        fk = ffn.mix_k * xx2 + (1 - ffn.mix_k) * dd
        fr = ffn.mix_r * xx2 + (1 - ffn.mix_r) * dd
        gate_loc = jax.nn.sigmoid(_qdot_col(fr, ffn.receptance))  # [B, E/tp]
        h = jnp.square(jax.nn.relu(_qdot_col(fk, ffn.key)))       # [B, F/tp]
        vfull = jax.lax.psum(_qdot_row_partial(h, ffn.value), ax)  # psum 2
        gate = _all_gather_inv(gate_loc, ax, axis=-1, tiled=True)
        x = x + gate * vfull
        return x, WKVState(xx, chan.aa, chan.bb, chan.pp, xx2)

    per_layer = ((params.ln1, params.ln2, params.att, params.ffn),
                 tuple(state))
    x, new_state = jax.lax.scan(block, x, per_layer)

    h = layer_norm(x, params.ln_out.weight, params.ln_out.bias)
    logits_loc = _qdot_col(h, params.head)          # [B, Vp/tp]
    if params.logit_bias is not None:
        logits_loc = logits_loc + params.logit_bias
    logits = _all_gather_inv(logits_loc, ax, axis=-1, tiled=True)
    return logits, WKVState(*new_state)


def make_tp_step(mesh: Mesh, params: RWKVParams):
    """Build a jitted (params, token, state) -> (logits, state) decode step
    running under shard_map with the layouts of parallel/sharding.py and
    3L + 2 collectives per token. token: [B] int32 (B sharded over 'data');
    state leaves [L, B, E]."""
    tp = mesh.shape["model"]
    if not isinstance(params.head, QuantLinear) or not isinstance(
            params.att.key, QuantLinear):
        raise TypeError("tp_step requires quantized params "
                        "(models.rwkv4.quantize_params)")
    V = params.emb.shape[0]
    if V % tp or params.head.w.shape[-1] % tp:
        raise ValueError(
            f"tp_step needs the (padded) vocab divisible by model={tp}; "
            f"apply models.rwkv4.pad_vocab first (got {V})"
        )
    pspecs = param_pspecs(params, n_model=tp)
    sspecs = state_pspecs(batched=True)
    fn = functools.partial(_tp_step_local, n_model=tp)
    sm = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P("data"), sspecs),
        out_specs=(P("data", None), sspecs),
        check_vma=_CHECK_VMA,
    )
    return jax.jit(sm)
