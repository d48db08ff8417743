"""RWKV-v4 model as a functional JAX pytree.

Design (TPU-first, not a port of the reference engine):

  * Params are dataclass pytrees with a *stacked leading layer dim* on every
    per-layer tensor, so the residual stack is one `lax.scan` over layers —
    constant compile time in depth, and XLA pipelines layer weights from HBM.
  * The sequence dim is batched through every matmul (MXU-sized [T, E] x
    [E, *] products); only the elementwise WKV/token-shift recurrences scan
    over T. The reference instead loops tokens serially inside every kernel
    (include/rwkv/cuda/rwkv.cu:227) — that design would idle the MXU.
  * State is an explicit functional pytree (5 tensors [L, ..., E], matching
    the reference's RWKVState xy/aa/bb/pp/dd quintet,
    include/rwkv/rwkv/rwkv.h:140-242); callers thread it, which makes
    snapshot/branch/restore (storygen, vectordb) free.
  * Weights are u8 QuantLinear (ops/quant.py) or plain dense arrays — the
    forward is generic over either via qmatmul/`@`.

Math parity: embeddings + ln0 + per-block att/ffn exactly as the reference
forward (rwkv.cu:493-593); see ops/wkv.py for the recurrence form.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.ops.layernorm import layer_norm
from rwkv_tpu.ops.quant import (
    Quant4Linear,
    QuantLinear,
    q4matmul,
    qmatmul,
    quantize,
    quantize4,
)
from rwkv_tpu.ops.wkv import (
    WKVChannelState,
    empty_channel_state,
    wkv_parallel,
    wkv_scan,
    wkv_step,
)

Linear = QuantLinear | Quant4Linear | jax.Array  # dense: plain [in, out]


def _matmul(x: jax.Array, w: Linear, compute_dtype=jnp.float32) -> jax.Array:
    if isinstance(w, Quant4Linear):
        return q4matmul(x, w, compute_dtype=compute_dtype)
    if isinstance(w, QuantLinear):
        return qmatmul(x, w, compute_dtype=compute_dtype)
    if compute_dtype != x.dtype:
        return jnp.matmul(x.astype(compute_dtype), w.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
    return x @ w


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LNParams:
    weight: jax.Array  # [..., E]
    bias: jax.Array    # [..., E]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttParams:
    """Time-mix (attention-analog) half of a block. Leading dim: L."""

    mix_k: jax.Array  # [L, E]
    mix_v: jax.Array  # [L, E]
    mix_r: jax.Array  # [L, E]
    key: Linear        # [L, E, E]
    value: Linear      # [L, E, E]
    receptance: Linear # [L, E, E]
    output: Linear     # [L, E, E]
    decay: jax.Array   # [L, E] — already -exp(time_decay)
    bonus: jax.Array   # [L, E] — time_first


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FFNParams:
    """Channel-mix half of a block. Leading dim: L."""

    mix_k: jax.Array   # [L, E]
    mix_r: jax.Array   # [L, E]
    key: Linear        # [L, E, 4E]
    value: Linear      # [L, 4E, E]
    receptance: Linear # [L, E, E]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RWKVParams:
    emb: jax.Array     # [V, E] float32
    ln0: LNParams      # [E]
    ln1: LNParams      # [L, E]
    ln2: LNParams      # [L, E]
    att: AttParams
    ffn: FFNParams
    ln_out: LNParams   # [E]
    head: Linear       # [E, V]
    # When the vocab is padded for TP divisibility / MXU lanes (pad_vocab),
    # this [V_padded] bias is 0 for real tokens and -1e9 for padding, so
    # padded logits can never be sampled. None for unpadded models.
    logit_bias: Optional[jax.Array] = None

    @property
    def n_layer(self) -> int:
        return self.att.decay.shape[0]

    @property
    def n_embd(self) -> int:
        return self.emb.shape[1]

    @property
    def vocab_size(self) -> int:
        return self.emb.shape[0]

    @property
    def config(self) -> RWKVConfig:
        return RWKVConfig(
            n_layer=self.n_layer, n_embd=self.n_embd, vocab_size=self.vocab_size
        )


class WKVState(NamedTuple):
    """Full recurrent state of one stream: 5 tensors [L, ..., E].

    Mirrors the reference RWKVState (xy, aa, bb, pp, dd). The '...' middle
    dims (if any) are stream/batch dims — vmap-compatible.
    """

    xy: jax.Array  # att token-shift memory
    aa: jax.Array
    bb: jax.Array
    pp: jax.Array
    dd: jax.Array  # ffn token-shift memory


def init_state(
    config: RWKVConfig, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32
) -> WKVState:
    """Empty state: zeros except pp = -1e30 (converter/convert_model.py:19)."""
    shape = (config.n_layer,) + tuple(batch_shape) + (config.n_embd,)
    chan = empty_channel_state(shape, dtype)
    return WKVState(
        xy=jnp.zeros(shape, dtype),
        aa=chan.aa,
        bb=chan.bb,
        pp=chan.pp,
        dd=jnp.zeros(shape, dtype),
    )


# ---------------------------------------------------------------------------
# Per-block halves. x and states carry arbitrary leading batch dims [..., E];
# the sequence variants take x [T, ..., E].
# ---------------------------------------------------------------------------


def _last_valid(xx: jax.Array, length) -> jax.Array:
    """xx at the last VALID position (the carried token-shift state) —
    xx[-1] when unmasked. length: scalar, or [B] per-stream lengths with
    xx [T, B, E] (ragged batched prefill)."""
    if length is None:
        return xx[-1]
    if getattr(length, "ndim", 0) == 0 or isinstance(length, int):
        return jax.lax.dynamic_index_in_dim(xx, length - 1, axis=0,
                                            keepdims=False)
    idx = jnp.maximum(length - 1, 0)[None, :, None]  # [1, B, 1]
    return jnp.take_along_axis(
        xx, jnp.broadcast_to(idx, (1,) + xx.shape[1:]), axis=0
    )[0]


def _carry_valid(new, old, length):
    """Per-stream ragged prefill: a stream with zero valid tokens in this
    chunk keeps its previous token-shift state."""
    if length is None or getattr(length, "ndim", 0) == 0:
        return new
    return jnp.where((length > 0)[:, None], new, old)


def _att_seq(
    x: jax.Array, layer: AttParams, ln: LNParams, xy: jax.Array, chan: WKVChannelState,
    *, parallel: bool, mask=None, length=None, compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, WKVChannelState]:
    """Time-mix over a sequence. x: [T, ..., E]; xy: [..., E] prior token."""
    xx = layer_norm(x, ln.weight, ln.bias)
    prev = jnp.concatenate([xy[None], xx[:-1]], axis=0)  # token-shift
    mm = functools.partial(_matmul, compute_dtype=compute_dtype)
    k = mm(layer.mix_k * xx + (1 - layer.mix_k) * prev, layer.key)
    v = mm(layer.mix_v * xx + (1 - layer.mix_v) * prev, layer.value)
    r = mm(layer.mix_r * xx + (1 - layer.mix_r) * prev, layer.receptance)
    wkv_fn = wkv_parallel if parallel else wkv_scan
    y, chan = wkv_fn(k, v, chan, layer.decay, layer.bonus, mask)
    rwkv = jax.nn.sigmoid(r) * y
    new_xy = _carry_valid(_last_valid(xx, length), xy, length)
    return x + mm(rwkv, layer.output), new_xy, chan


def _ffn_seq(
    x: jax.Array, layer: FFNParams, ln: LNParams, dd: jax.Array, *,
    length=None, compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Channel-mix over a sequence. x: [T, ..., E]; dd: [..., E]."""
    xx = layer_norm(x, ln.weight, ln.bias)
    prev = jnp.concatenate([dd[None], xx[:-1]], axis=0)
    k_in = layer.mix_k * xx + (1 - layer.mix_k) * prev
    r_in = layer.mix_r * xx + (1 - layer.mix_r) * prev
    mm = functools.partial(_matmul, compute_dtype=compute_dtype)
    gate = jax.nn.sigmoid(mm(r_in, layer.receptance))
    kk = jnp.square(jax.nn.relu(mm(k_in, layer.key)))
    new_dd = _carry_valid(_last_valid(xx, length), dd, length)
    return x + gate * mm(kk, layer.value), new_dd


def _att_step(
    x: jax.Array, layer: AttParams, ln: LNParams, xy: jax.Array, chan: WKVChannelState
) -> Tuple[jax.Array, jax.Array, WKVChannelState]:
    """Single-token time-mix. x: [..., E]."""
    xx = layer_norm(x, ln.weight, ln.bias)
    k = _matmul(layer.mix_k * xx + (1 - layer.mix_k) * xy, layer.key)
    v = _matmul(layer.mix_v * xx + (1 - layer.mix_v) * xy, layer.value)
    r = _matmul(layer.mix_r * xx + (1 - layer.mix_r) * xy, layer.receptance)
    y, chan = wkv_step(k, v, chan, layer.decay, layer.bonus)
    rwkv = jax.nn.sigmoid(r) * y
    return x + _matmul(rwkv, layer.output), xx, chan


def _ffn_step(
    x: jax.Array, layer: FFNParams, ln: LNParams, dd: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    xx = layer_norm(x, ln.weight, ln.bias)
    k_in = layer.mix_k * xx + (1 - layer.mix_k) * dd
    r_in = layer.mix_r * xx + (1 - layer.mix_r) * dd
    gate = jax.nn.sigmoid(_matmul(r_in, layer.receptance))
    kk = jnp.square(jax.nn.relu(_matmul(k_in, layer.key)))
    return x + gate * _matmul(kk, layer.value), xx


def _layer_slice(params: RWKVParams, i=None):
    """Pytree of one layer's params (or the stacked pytree for lax.scan)."""
    per_layer = (params.ln1, params.ln2, params.att, params.ffn)
    if i is None:
        return per_layer
    return jax.tree.map(lambda a: a[i], per_layer)


def forward_seq(
    params: RWKVParams,
    tokens: jax.Array,
    state: WKVState,
    *,
    parallel: bool = False,
    return_all_logits: bool = False,
    length: jax.Array | None = None,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, WKVState]:
    """Run a token sequence through the model (the reference's GPT mode).

    tokens: [T] (or [T, B] for per-position batches sharing positions).
    length: optional scalar — or, for [T, B] tokens with parallel=True,
    a [B] vector of per-stream lengths (ragged batched prefill) — giving
    the number of *valid* leading tokens; positions >= length are padding
    whose state updates are no-ops. Lets callers pad prompts into fixed
    jit buckets instead of recompiling per length.
    compute_dtype: matmul input dtype. f32 default; bf16 runs the MXU at
    4x the f32 rate (prefill is compute-bound, unlike decode) with f32
    accumulation — added rounding is the same order as the u8 weight
    quantization noise (measure with eval/ppl.py).
    Returns (logits, new_state); logits [V] for the last valid position, or
    [T, ..., V] when return_all_logits (needed for perplexity eval).
    """
    x = params.emb[tokens].astype(jnp.float32)  # [T, ..., E]
    x = layer_norm(x, params.ln0.weight, params.ln0.bias)
    T = x.shape[0]
    mask = None
    if length is not None:
        if getattr(length, "ndim", 0) >= 1:
            if not parallel:
                raise ValueError("per-stream lengths need parallel=True")
            mask = jnp.arange(T)[:, None] < length[None, :]  # [T, B]
        else:
            mask = jnp.arange(T) < length

    def block(carry, layer):
        x, = carry
        (ln1, ln2, att, ffn), (xy, aa, bb, pp, dd) = layer
        x, xy, chan = _att_seq(
            x, att, ln1, xy, WKVChannelState(aa, bb, pp),
            parallel=parallel, mask=mask, length=length,
            compute_dtype=compute_dtype,
        )
        x, dd = _ffn_seq(x, ffn, ln2, dd, length=length,
                         compute_dtype=compute_dtype)
        return (x,), WKVState(xy, chan.aa, chan.bb, chan.pp, dd)

    (x,), new_state = jax.lax.scan(
        block, (x,), (_layer_slice(params), tuple(state))
    )
    new_state = WKVState(*new_state)

    x = layer_norm(x, params.ln_out.weight, params.ln_out.bias)
    if return_all_logits:
        logits = _matmul(x, params.head, compute_dtype=compute_dtype)
    else:
        logits = _matmul(_last_valid(x, length), params.head,
                         compute_dtype=compute_dtype)
    if params.logit_bias is not None:
        logits = logits + params.logit_bias
    return logits, new_state


def forward_step(
    params: RWKVParams, token: jax.Array, state: WKVState
) -> Tuple[jax.Array, WKVState]:
    """One decode step. token: scalar int (or [B] with state [L, B, E] leaves).

    Returns (logits [..., V], new_state).
    """
    x = params.emb[token].astype(jnp.float32)
    x = layer_norm(x, params.ln0.weight, params.ln0.bias)

    def block(carry, layer):
        x, = carry
        (ln1, ln2, att, ffn), (xy, aa, bb, pp, dd) = layer
        x, xy, chan = _att_step(x, att, ln1, xy, WKVChannelState(aa, bb, pp))
        x, dd = _ffn_step(x, ffn, ln2, dd)
        return (x,), WKVState(xy, chan.aa, chan.bb, chan.pp, dd)

    (x,), new_state = jax.lax.scan(
        block, (x,), (_layer_slice(params), tuple(state))
    )
    new_state = WKVState(*new_state)

    x = layer_norm(x, params.ln_out.weight, params.ln_out.bias)
    logits = _matmul(x, params.head)
    if params.logit_bias is not None:
        logits = logits + params.logit_bias
    return logits, new_state


# ---------------------------------------------------------------------------
# Initialization / quantization helpers
# ---------------------------------------------------------------------------


def init_params(
    key: jax.Array, config: RWKVConfig, dtype=jnp.float32
) -> RWKVParams:
    """Random dense params (for tests/benches; real weights come from io/)."""
    E, L, V, F = config.n_embd, config.n_layer, config.vocab_size, config.n_ffn
    ks = iter(jax.random.split(key, 24))

    def mat(shape, scale):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    def mix(shape):
        return jax.random.uniform(next(ks), shape, minval=0.1, maxval=0.9).astype(dtype)

    return RWKVParams(
        emb=mat((V, E), 0.1),
        ln0=LNParams(jnp.ones((E,), dtype), jnp.zeros((E,), dtype)),
        ln1=LNParams(jnp.ones((L, E), dtype), jnp.zeros((L, E), dtype)),
        ln2=LNParams(jnp.ones((L, E), dtype), jnp.zeros((L, E), dtype)),
        att=AttParams(
            mix_k=mix((L, E)),
            mix_v=mix((L, E)),
            mix_r=mix((L, E)),
            key=mat((L, E, E), E**-0.5),
            value=mat((L, E, E), E**-0.5),
            receptance=mat((L, E, E), E**-0.5),
            output=mat((L, E, E), E**-0.5),
            decay=-jnp.exp(mat((L, E), 1.0)),
            bonus=mat((L, E), 0.5),
        ),
        ffn=FFNParams(
            mix_k=mix((L, E)),
            mix_r=mix((L, E)),
            key=mat((L, E, F), E**-0.5),
            value=mat((L, F, E), F**-0.5),
            receptance=mat((L, E, E), E**-0.5),
        ),
        ln_out=LNParams(jnp.ones((E,), dtype), jnp.zeros((E,), dtype)),
        head=mat((E, V), E**-0.5),
    )


def random_quantized_params_np(
    cfg: RWKVConfig, seed: int = 0, pad_multiple: int | None = 512,
    pretile: int | None = None,
) -> RWKVParams:
    """Random u8-quantized params built entirely host-side in numpy — one
    device_put per leaf at the end. Use for benches on remote/tunneled
    devices where generating dense weights on-device and pulling them back
    for quantization would round-trip gigabytes.

    pretile: fabricate column-sliced families directly in the decode
    kernel's contiguous-block layout (see random_quantized_params_device).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    E, L, V, F = cfg.n_embd, cfg.n_layer, cfg.vocab_size, cfg.n_ffn
    Vp = V
    if pad_multiple:
        Vp = ((V + pad_multiple - 1) // pad_multiple) * pad_multiple

    def qrand(shape, col=False):
        """Directly fabricate a plausible QuantLinear: u8 weights + scales
        sized like a quantized N(0, 1/sqrt(in)) matrix — no f32 detour."""
        in_dim = shape[-2]
        span = 8.0 * in_dim ** -0.5  # ~±4 sigma
        scale = np.full(shape[:-1], span / 255.0, np.float32)
        offset = np.full(shape[:-1], -span / 2.0, np.float32)
        wshape = shape
        if col and pretile:
            L_, K, O = shape
            wshape = (L_, O // pretile, K, pretile)
        w = rng.integers(0, 256, size=wshape, dtype=np.uint8)
        return QuantLinear(w=jnp.asarray(w), scale=jnp.asarray(scale),
                           offset=jnp.asarray(offset))

    def f32(a):
        return jnp.asarray(np.asarray(a, np.float32))

    def mix(shape):
        return f32(rng.uniform(0.1, 0.9, size=shape))

    emb = np.zeros((Vp, E), np.float32)
    emb[:V] = rng.normal(0, 0.1, size=(V, E)).astype(np.float32)
    logit_bias = None
    if Vp != V:
        lb = np.zeros((Vp,), np.float32)
        lb[V:] = -1e9
        logit_bias = f32(lb)

    return RWKVParams(
        emb=jnp.asarray(emb),
        ln0=LNParams(f32(np.ones(E)), f32(np.zeros(E))),
        ln1=LNParams(f32(np.ones((L, E))), f32(np.zeros((L, E)))),
        ln2=LNParams(f32(np.ones((L, E))), f32(np.zeros((L, E)))),
        att=AttParams(
            mix_k=mix((L, E)), mix_v=mix((L, E)), mix_r=mix((L, E)),
            key=qrand((L, E, E), col=True), value=qrand((L, E, E), col=True),
            receptance=qrand((L, E, E), col=True), output=qrand((L, E, E)),
            decay=f32(-np.exp(rng.normal(size=(L, E)))),
            bonus=f32(rng.normal(size=(L, E)) * 0.5),
        ),
        ffn=FFNParams(
            mix_k=mix((L, E)), mix_r=mix((L, E)),
            key=qrand((L, E, F), col=True), value=qrand((L, F, E)),
            receptance=qrand((L, E, E), col=True),
        ),
        ln_out=LNParams(f32(np.ones(E)), f32(np.zeros(E))),
        head=qrand((E, Vp)),
        logit_bias=logit_bias,
    )


def signedize_params(params: RWKVParams) -> RWKVParams:
    """Re-center every QuantLinear to signed int8 storage (ops.quant.to_signed)
    — required by the Pallas kernels (Mosaic has no u8->float cast).
    Numerically identical: (W-128)*r + (o+128r) == W*r + o."""
    from rwkv_tpu.ops.quant import to_signed

    def f(leaf):
        return leaf

    def conv(lin: Linear) -> Linear:
        return to_signed(lin) if isinstance(lin, QuantLinear) else lin

    return dataclasses.replace(
        params,
        att=dataclasses.replace(
            params.att,
            key=conv(params.att.key), value=conv(params.att.value),
            receptance=conv(params.att.receptance), output=conv(params.att.output),
        ),
        ffn=dataclasses.replace(
            params.ffn,
            key=conv(params.ffn.key), value=conv(params.ffn.value),
            receptance=conv(params.ffn.receptance),
        ),
        head=conv(params.head),
    )


def random_quantized_params_device(
    cfg: RWKVConfig, seed: int = 0, pad_multiple: int | None = 512,
    signed: bool = True, pretile: int | None = None,
    q4: bool = False, q4_tile: int | None = None,
) -> RWKVParams:
    """Random quantized params generated ON-DEVICE (jit'd PRNG per leaf) —
    zero bulk host->device transfer. For benching big models over slow
    links where even fabricating 7GB host-side and shipping it is minutes.

    pretile: fabricate the column-sliced weight families directly in the
    decode kernel's contiguous-block layout [L, O/t, E, t]
    (ops.pallas.decode_stack.pretile_params) — random content makes the
    permutation irrelevant, and generating in-layout avoids the transient
    2x-family HBM copy that would OOM a 14B pretile on a 16GB chip.

    q4: fabricate 4-bit Quant4Linear families (packed int8, half the
    bytes); q4_tile sets the row-tiled families' block tag (defaults to
    pick_tile_q4) — content is random so only the tag matters."""
    from rwkv_tpu.ops.quant import Quant4Linear

    E, L, V, F = cfg.n_embd, cfg.n_layer, cfg.vocab_size, cfg.n_ffn
    Vp = V
    if pad_multiple:
        Vp = ((V + pad_multiple - 1) // pad_multiple) * pad_multiple
    if q4 and q4_tile is None:
        from rwkv_tpu.ops.pallas.decode_stack import pick_tile_q4

        q4_tile = pick_tile_q4(E)

    kit = iter(jax.random.split(jax.random.PRNGKey(seed), 32))

    @partial_jit_shape
    def qw(key, shape):
        if signed or q4:  # q4 packed bytes are always int8 storage
            return jax.random.randint(key, shape, -128, 128, dtype=jnp.int8)
        return jax.random.randint(key, shape, 0, 256, dtype=jnp.uint8)

    def qrand(shape, col=False, row=False):
        in_dim = shape[-2]
        if q4:
            span = 8.0 * in_dim ** -0.5
            r = span / 15.0
            scale = jnp.full(shape[:-1], r, jnp.float32)
            offset = jnp.full(shape[:-1], -span / 2.0 + 8.0 * r, jnp.float32)
            wshape = shape[:-2] + (shape[-2] // 2, shape[-1])
            if col and pretile:
                L_, K2, O = wshape
                wshape = (L_, O // pretile, K2, pretile)
            return Quant4Linear(wp=qw(next(kit), wshape), scale=scale,
                                offset=offset,
                                block=q4_tile if row else None)
        span = 8.0 * in_dim ** -0.5
        scale = jnp.full(shape[:-1], span / 255.0, jnp.float32)
        off0 = -span / 2.0 + (128.0 * span / 255.0 if signed else 0.0)
        offset = jnp.full(shape[:-1], off0, jnp.float32)
        wshape = shape
        if col and pretile:
            L_, K, O = shape
            wshape = (L_, O // pretile, K, pretile)
        return QuantLinear(w=qw(next(kit), wshape), scale=scale, offset=offset)

    def mix(shape):
        return jax.random.uniform(next(kit), shape, minval=0.1, maxval=0.9)

    emb = jnp.zeros((Vp, E), jnp.float32)
    emb = emb.at[:V].set(jax.random.normal(next(kit), (V, E)) * 0.1)
    logit_bias = None
    if Vp != V:
        logit_bias = jnp.where(jnp.arange(Vp) < V, 0.0, -1e9).astype(jnp.float32)

    ones = lambda *s: jnp.ones(s, jnp.float32)     # noqa: E731
    zeros = lambda *s: jnp.zeros(s, jnp.float32)   # noqa: E731

    return RWKVParams(
        emb=emb,
        ln0=LNParams(ones(E), zeros(E)),
        ln1=LNParams(ones(L, E), zeros(L, E)),
        ln2=LNParams(ones(L, E), zeros(L, E)),
        att=AttParams(
            mix_k=mix((L, E)), mix_v=mix((L, E)), mix_r=mix((L, E)),
            key=qrand((L, E, E), col=True), value=qrand((L, E, E), col=True),
            receptance=qrand((L, E, E), col=True),
            output=qrand((L, E, E), row=True),
            decay=-jnp.exp(jax.random.normal(next(kit), (L, E))),
            bonus=jax.random.normal(next(kit), (L, E)) * 0.5,
        ),
        ffn=FFNParams(
            mix_k=mix((L, E)), mix_r=mix((L, E)),
            key=qrand((L, E, F), col=True), value=qrand((L, F, E), row=True),
            receptance=qrand((L, E, E), col=True),
        ),
        ln_out=LNParams(ones(E), zeros(E)),
        head=qrand((E, Vp)),
        logit_bias=logit_bias,
    )


def partial_jit_shape(f):
    """jit with the shape argument static (helper for on-device fabrication)."""
    import functools

    return functools.partial(jax.jit, static_argnums=(1,))(f)


def pad_vocab(params: RWKVParams, multiple: int = 128) -> RWKVParams:
    """Pad the vocab dim of emb/head up to `multiple` (TPU lanes / TP
    divisibility — 50277 is 3x16759 and shards over nothing). Padded logits
    are forced to -1e9 via `logit_bias` so they can never be sampled; padded
    embedding rows are zero and unreachable from a real tokenizer."""
    V = params.emb.shape[0]
    Vp = ((V + multiple - 1) // multiple) * multiple
    if Vp == V and params.logit_bias is not None:
        return params
    pad = Vp - V

    emb = jnp.pad(params.emb, ((0, pad), (0, 0)))
    head = params.head
    if isinstance(head, QuantLinear):
        head = QuantLinear(
            w=jnp.pad(head.w, ((0, 0), (0, pad))),
            scale=head.scale,
            offset=head.offset,
        )
    elif isinstance(head, Quant4Linear):
        # O (vocab) is the unpacked lane dim of the packed tensor; padding
        # it with 0-bytes decodes to the centered code -8 on both nibbles,
        # which logit_bias -1e9 masks regardless
        head = dataclasses.replace(
            head, wp=jnp.pad(head.wp, ((0, 0), (0, pad))))
    else:
        head = jnp.pad(head, ((0, 0), (0, pad)))
    if params.logit_bias is not None:
        # re-padding an already-padded model: keep the old pad ids banned
        bias = jnp.concatenate(
            [params.logit_bias, jnp.full((pad,), -1e9, jnp.float32)]
        )
    else:
        bias = jnp.where(jnp.arange(Vp) < V, 0.0, -1e9).astype(jnp.float32)
    return dataclasses.replace(params, emb=emb, head=head, logit_bias=bias)


def quantize_params(params: RWKVParams, as_numpy: bool = False) -> RWKVParams:
    """Quantize the 8 matrix families to u8 (emb/norms/mix stay dense,
    exactly the reference converter's split, convert_model.py:62-92).

    as_numpy: host-only results (see ops.quant.quantize) — required for
    the offline converter path."""

    def q(w: Linear) -> QuantLinear:
        return w if isinstance(w, QuantLinear) else quantize(w, as_numpy=as_numpy)

    return dataclasses.replace(
        params,
        att=dataclasses.replace(
            params.att,
            key=q(params.att.key),
            value=q(params.att.value),
            receptance=q(params.att.receptance),
            output=q(params.att.output),
        ),
        ffn=dataclasses.replace(
            params.ffn,
            key=q(params.ffn.key),
            value=q(params.ffn.value),
            receptance=q(params.ffn.receptance),
        ),
        head=q(params.head),
    )


def quantize_params_q4(
    params: RWKVParams,
    tile: int | None = None,
    as_numpy: bool = False,
) -> RWKVParams:
    """Quantize the 8 matrix families to 4-bit Quant4Linear — the
    beyond-parity format (the reference converter is Q8_0-only,
    convert_model.py:108-119): decode is weight-HBM-bound, so 4 bits
    halve bytes/token (ops/pallas/mm4.py has the measured 2x).

    Column-sliced families (contraction resident in the kernel) pack with
    the global split-half layout; the row-tiled families (att.output,
    ffn.value — streamed `tile` contraction rows per grid step) pack
    per-tile so each kernel block is self-contained. `tile` must match
    the decode_stack tile (default: pick_tile_q4)."""
    if tile is None:
        from rwkv_tpu.ops.pallas.decode_stack import pick_tile_q4

        tile = pick_tile_q4(params.n_embd)

    def q(w: Linear, block: int | None = None) -> Quant4Linear:
        if isinstance(w, Quant4Linear):
            assert w.block == block, (w.block, block)
            return w
        if isinstance(w, QuantLinear):
            raise TypeError("cannot requantize u8 params to 4-bit; "
                            "start from dense weights")
        return quantize4(w, block=block, as_numpy=as_numpy)

    return dataclasses.replace(
        params,
        att=dataclasses.replace(
            params.att,
            key=q(params.att.key),
            value=q(params.att.value),
            receptance=q(params.att.receptance),
            output=q(params.att.output, block=tile),
        ),
        ffn=dataclasses.replace(
            params.ffn,
            key=q(params.ffn.key),
            value=q(params.ffn.value, block=tile),
            receptance=q(params.ffn.receptance),
        ),
        head=q(params.head),
    )
