"""Named shardings for RWKV-v4 tensor parallelism.

The TP layout (Megatron-style column->row pairing, adapted to RWKV):

  att half (per block):
    km/vm/rm      [L, E, E]   column-parallel  P(None, None, 'model')
    -> k,v,r activations sharded on E; WKV is elementwise over E so the
       recurrence runs fully sharded with zero communication —
       decay/bonus/aa/bb/pp shard on their E dim.
    att.output    [L, E, E]   row-parallel     P(None, 'model', None)
    -> one reduction (psum over 'model', inserted by GSPMD) per att half.
  ffn half:
    ffn.key       [L, E, 4E]  column-parallel; relu^2 elementwise sharded
    ffn.value     [L, 4E, E]  row-parallel -> second reduction per block
    ffn.receptance[L, E, E]   column-parallel (gate resharded cheaply)
  head            [E, V]      column-parallel -> logits sharded on V
  emb             [V, E]      row(vocab)-parallel gather
  layernorms/mixes/token-shift states: replicated (O(E) each).

Per-input-channel quant vectors (scale/offset) shard with the *contracted*
dim of their matrix for row-parallel weights (the (x.o) correction term then
reduces in the same psum), and stay replicated for column-parallel weights.

Streams (the batch dim of token ids and of state pools) shard over 'data'.
"""

from __future__ import annotations

import dataclasses
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwkv_tpu.models.rwkv4 import (
    AttParams,
    FFNParams,
    LNParams,
    RWKVParams,
    WKVState,
)
from rwkv_tpu.ops.quant import Quant4Linear, QuantLinear


def _q(wspec: P, vecspec: P) -> QuantLinear:
    return QuantLinear(w=wspec, scale=vecspec, offset=vecspec)


def _q4(wspec: P, vecspec: P, block) -> Quant4Linear:
    # `block` is a STATIC pytree field: the spec tree's treedef must match
    # the params', so it carries the params' own block tag
    return Quant4Linear(wp=wspec, scale=vecspec, offset=vecspec, block=block)


REP1 = P()          # replicated vector [E]
REP2 = P(None,)     # replicated [L, E] (same as P(); explicit for reading)


def param_pspecs(params: RWKVParams, n_model: int | None = None) -> RWKVParams:
    """A pytree of PartitionSpec with the same structure as `params`.

    n_model: size of the 'model' axis, used to decide whether the vocab dim
    of emb/head is divisible enough to shard (pad_vocab first for real
    models; unpadded odd-vocab models fall back to replicated emb/head).
    """
    rep = P()
    ln = LNParams(rep, rep)
    V = params.emb.shape[0]
    vocab_ok = n_model is None or (V % n_model == 0)

    def mk(linp, row_parallel):
        if isinstance(linp, Quant4Linear):
            # packed [L, K/2, O]: the split-half pairing is block-local
            # (block=tile for the row-parallel families), and tile divides
            # E/tp, so sharding the packed contraction dim keeps whole
            # packed blocks per shard
            if linp.wp.ndim == 4:
                return _q4(P(None, "model", None, None), rep, linp.block)
            w = (P(None, "model", None) if row_parallel
                 else P(None, None, "model"))
            vec = P(None, "model") if row_parallel else rep
            return _q4(w, vec, linp.block)
        if (isinstance(linp, QuantLinear)
                and getattr(linp.w, "ndim", 3) == 4):
            # pretiled contiguous-block layout [L, O/t, E, t]
            # (decode_stack.pretile_params — column families only): shard
            # the BLOCK dim, which partitions the same output columns
            return _q(P(None, "model", None, None), rep)
        w = P(None, "model", None) if row_parallel else P(None, None, "model")
        if isinstance(linp, QuantLinear):
            vec = P(None, "model") if row_parallel else rep
            return _q(w, vec)
        return w

    att = AttParams(
        mix_k=rep, mix_v=rep, mix_r=rep,
        key=mk(params.att.key, False),
        value=mk(params.att.value, False),
        receptance=mk(params.att.receptance, False),
        output=mk(params.att.output, True),
        decay=rep, bonus=rep,
    )
    ffn = FFNParams(
        mix_k=rep, mix_r=rep,
        key=mk(params.ffn.key, False),
        value=mk(params.ffn.value, True),
        receptance=mk(params.ffn.receptance, False),
    )
    head_w = P(None, "model") if vocab_ok else P()
    if isinstance(params.head, Quant4Linear):
        head = _q4(head_w, rep, params.head.block)
    elif isinstance(params.head, QuantLinear):
        head = _q(head_w, rep)
    else:
        head = head_w
    return RWKVParams(
        emb=P("model", None) if vocab_ok else P(),  # vocab-sharded gather
        ln0=ln, ln1=ln, ln2=ln,
        att=att, ffn=ffn,
        ln_out=ln,
        head=head,
        logit_bias=None if params.logit_bias is None
        else (P("model") if vocab_ok else P()),
    )


def state_pspecs(batched: bool = True, n_model: int = 0) -> WKVState:
    """State sharding: WKV accumulators sharded on E over 'model'; token-shift
    memories replicated over 'model'; stream dim over 'data'.

    n_model=1 drops the 'model' axis entirely: the tp=1 bodies elide every
    model-axis collective (tp_step.py), so under check_vma nothing may be
    typed model-varying — a 'model'-sharded spec on a 1-wide axis is the
    same arrays but a different vma type, which breaks the scan carry."""
    if batched:
        shift = P(None, "data", None)          # [L, B, E]
        chan = shift if n_model == 1 else P(None, "data", "model")
    else:
        shift = P(None, None)                  # [L, E]
        chan = shift if n_model == 1 else P(None, "model")
    return WKVState(xy=shift, aa=chan, bb=chan, pp=chan, dd=shift)


def shard_params(params: RWKVParams, mesh: Mesh) -> RWKVParams:
    specs = param_pspecs(params, n_model=mesh.shape["model"])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_state(state: WKVState, mesh: Mesh, batched: bool = True) -> WKVState:
    # n_model from the mesh (like shard_params): a model=1 mesh must get
    # 'model'-free specs so the tp=1 collective-elided bodies type-check
    # under check_vma (see state_pspecs).
    specs = state_pspecs(batched, n_model=mesh.shape["model"])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


@dataclasses.dataclass
class ShardingContext:
    """Carried by the engine: mesh + whether streams are batched."""

    mesh: Mesh


def make_put(ctx: "ShardingContext | Mesh"):
    """A `put(name, host_array)` for binfmt.read_bin that lands each tensor
    directly in its TP layout (streaming disk -> sharded HBM: each device
    only receives its shard, host RAM stays one-tensor-sized)."""
    mesh = ctx.mesh if isinstance(ctx, ShardingContext) else ctx

    # checkpoint-tensor name -> PartitionSpec (quantized registry names)
    by_name = {
        "embed": P("model", None),
        "km": P(None, None, "model"), "vm": P(None, None, "model"),
        "rm": P(None, None, "model"),
        "att_out": P(None, "model", None),
        "att_out_r": P(None, "model"), "att_out_o": P(None, "model"),
        "ffn_k": P(None, None, "model"),
        "ffn_v": P(None, "model", None),
        "ffn_vr": P(None, "model"), "ffn_vo": P(None, "model"),
        "ffn_r": P(None, None, "model"),
        "head": P(None, "model"),
        "logit_bias": P("model"),
    }
    vocab_dim = {"embed": 0, "head": 1, "logit_bias": 0}
    n_model = mesh.shape["model"]

    # pretiled (contiguous-block) column families arrive 4-D
    # [L, O/t, E, t] from read_bin(pretile=...): shard the BLOCK dim —
    # the same output-column partition as the 3-D column spec
    pretiled_col = {"km", "vm", "rm", "ffn_k", "ffn_r"}

    def put(name: str, arr: np.ndarray) -> jax.Array:
        spec = by_name.get(name, P())
        vd = vocab_dim.get(name)
        if vd is not None and arr.shape[vd] % n_model:
            spec = P()  # unpadded vocab: fall back to replication
        elif arr.ndim == 4 and name in pretiled_col:
            spec = P(None, "model", None, None)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return put
