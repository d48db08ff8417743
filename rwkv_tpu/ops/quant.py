"""Q8_0-style weight-only quantization: per-input-channel affine uint8.

Scheme (behavioral parity with the reference converter,
converter/convert_model.py:108-119):

  Given a weight W in the *matmul layout* [in, out] (so y = x @ W):
    o[j]   = min_k W[j, k]                       (per input channel j)
    r[j]   = (max_k W[j, k] - o[j]) / 255
    Q[j,k] = round-toward-zero((W[j,k] - o[j]) / r[j])  as uint8
    o[j]  += mean_k(frac((W[j,k]-o[j])/r[j])) * r[j]    (zero-point refinement)
  Dequant: W ≈ Q * r[j] + o[j].

(The reference quantizes torch's [out, in] weight reducing over dim 0 and then
transposes to [in, out] storage; reducing over the out dim of [out, in] is the
same as reducing over axis=1 of [in, out], i.e. per input channel.)

TPU-native matmul decomposition — the key identity this module is built on:

  y[k] = sum_j x[j] * (Q[j,k] * r[j] + o[j])
       = (x * r) @ Q  +  (x . o)

The affine-offset term is rank-1 (a scalar per batch row), so the hot loop is
a plain  (x*r) @ u8-matrix  product: u8 weights stream from HBM at 1 byte/elem
(the whole point — 2x less HBM traffic than bf16 at memory-bound batch sizes)
and are widened in-register to feed the MXU. XLA fuses the convert into the
dot; the Pallas kernel in ops/pallas/mm8.py does it explicitly with tiling.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinear:
    """A uint8 weight-only quantized linear layer, y = x @ dequant(w).

    May carry a leading stacked-layer dimension: w [L?, in, out] u8,
    scale/offset [L?, in] f32 (matching the reference's per-layer stacking of
    km/vm/rm/... ranges and zero-points).
    """

    w: jax.Array       # uint8, [..., in, out]
    scale: jax.Array   # float32, [..., in]   (reference: "ranges" r)
    offset: jax.Array  # float32, [..., in]   (reference: "zero points" o/mini)

    @property
    def in_features(self) -> int:
        return self.w.shape[-2]

    @property
    def out_features(self) -> int:
        return self.w.shape[-1]


def quantize(w: jax.Array | np.ndarray, *, stochastic: bool = False,
             as_numpy: bool = False) -> QuantLinear:
    """Quantize a dense [in, out] (or [L, in, out]) weight to QuantLinear.

    Pure-numpy/jnp equivalent of the reference converter's quantize_matrix
    (converter/convert_model.py:108-119), operating on the [in, out] layout
    directly. float64 intermediate math mirrors the converter's .double()
    usage so checkpoints round-trip bit-identically through our converter.

    as_numpy: keep the result on the host as numpy arrays. The offline
    converter MUST use this — its output goes to disk, and jnp.asarray
    places tensors on the default device, which over a remote-TPU tunnel
    turns a disk-to-disk conversion into a multi-GB device round-trip.
    """
    # Single-pass-frugal formulation (the converter is host-memory-bound):
    # min/max run on the f32 input (exact — no arithmetic), only `q` is
    # materialized in f64 (f32 values are exactly representable in f64, so
    # results are bit-identical to converting x up front), and `qu8`
    # doubles as floor(q) (q is in [0, 255], where uint8 truncation ==
    # floor) so no separate floor pass. Stacked [L, in, out] inputs
    # quantize layer-by-layer so the transient f64 `q` is one layer, not
    # the whole family (a 14B family would otherwise need ~56GB host RAM).
    x = np.asarray(w)
    o = x.min(axis=-1).astype(np.float64)   # [..., in]
    span = x.max(axis=-1).astype(np.float64) - o
    # Guard all-equal rows (span 0): scale 1 yields Q=0, dequant = offset.
    r = np.where(span > 0, span, 255.0) / 255.0
    qu8 = np.empty(x.shape, np.uint8)
    fmean = np.empty(o.shape, np.float64)
    for idx in (np.ndindex(x.shape[:-2]) if x.ndim > 2 else [()]):
        q = (x[idx] - o[idx][..., None]) / r[idx][..., None]  # f64 broadcast
        qu8[idx] = q.astype(np.uint8)
        fmean[idx] = (q - qu8[idx]).mean(axis=-1)
    # uint8 cast truncates toward zero in the reference (torch .to(uint8));
    # the refinement shifts the offset by the mean fractional residue.
    o = o + fmean * r
    if as_numpy:
        return QuantLinear(
            w=qu8, scale=r.astype(np.float32), offset=o.astype(np.float32)
        )
    return QuantLinear(
        w=jnp.asarray(qu8),
        scale=jnp.asarray(r, dtype=jnp.float32),
        offset=jnp.asarray(o, dtype=jnp.float32),
    )


def to_signed(q: QuantLinear) -> QuantLinear:
    """Re-center storage to int8: W8*r + o == (W8-128)*r + (o + 128*r).

    Mosaic (Pallas TPU) has no uint8->float cast, and int8 is the native MXU
    quant dtype; the checkpoint format stays u8 (reference-compatible), this
    transform is applied once at load time.
    """
    if q.w.dtype == jnp.int8:
        return q
    if isinstance(q.w, np.ndarray):
        # host path: u8 x -> x-128 as int8 IS the XOR-0x80 bit pattern —
        # one family-sized host copy, nothing touches the device (the
        # .safetensors->quantize ingest signedizes before upload this way)
        w = (q.w ^ np.uint8(0x80)).view(np.int8)
        return QuantLinear(w=w, scale=q.scale,
                           offset=q.offset + np.float32(128.0) * q.scale)
    # device path: allocates a SECOND copy of the family on device while
    # both pytrees are alive — at 14B (13.5 GB of weights) that
    # ResourceExhausts a 16 GB chip, so every ingest route signedizes on
    # the HOST instead (read_bin(signed=True) for .bin; the numpy branch
    # above for the .safetensors quantizer). This branch remains for
    # small/test pytrees that are already device-resident.
    w = (q.w.astype(jnp.int32) - 128).astype(jnp.int8)
    return QuantLinear(w=w, scale=q.scale, offset=q.offset + 128.0 * q.scale)


def dequantize(q: QuantLinear, dtype=jnp.float32) -> jax.Array:
    """Materialize the dense weight (tests/debug only — defeats the purpose)."""
    return (
        q.w.astype(dtype) * q.scale[..., None].astype(dtype)
        + q.offset[..., None].astype(dtype)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Quant4Linear:
    """A 4-bit weight-only quantized linear layer, y = x @ dequant4(wp).

    No reference analog (the reference converter is Q8_0-only,
    converter/convert_model.py:108-119) — this is the beyond-parity
    format: decode is weight-HBM-bound, so 4 bits halve bytes/token.

    Storage is SIGNED-CENTERED and nibble-packed for the TPU kernel
    (ops/pallas/mm4.py): wp [..., K/2, O] int8 holds two codes per byte,
    split-half along K (low nibble = rows [0,K/2) as unsigned q, high
    nibble = rows [K/2,K) as two's-complement q-8); `offset` already
    includes the +8*scale re-centering (the Q4 analog of to_signed).
    May carry a leading stacked-layer dim like QuantLinear.

    `block`: split-half pairing width. None = global (row j pairs with
    j + K/2 — the layout for contraction-resident matmuls). An int b
    pairs rows WITHIN each b-row block (j pairs with j + b/2 inside its
    block) so a row-tiled kernel step streaming b original rows gets a
    self-contained packed [b/2, O] tile (decode_stack's att.output /
    ffn.value families, tiled along the contraction).
    """

    wp: jax.Array      # int8, [..., K/2, O] nibble-packed
    scale: jax.Array   # float32, [..., K]
    offset: jax.Array  # float32, [..., K] (includes +8*scale centering)
    block: int | None = dataclasses.field(
        metadata=dict(static=True), default=None)

    @property
    def in_features(self) -> int:
        return self.wp.shape[-2] * 2

    @property
    def out_features(self) -> int:
        return self.wp.shape[-1]


def quantize4(w: jax.Array | np.ndarray, *, block: int | None = None,
              as_numpy: bool = False) -> Quant4Linear:
    """Quantize a dense [..., K, O] weight to 4-bit Quant4Linear.

    Per-input-channel affine over 16 levels with round-to-nearest and the
    same mean-fractional-residue zero-point refinement as quantize();
    packing layout documented on Quant4Linear / ops/pallas/mm4.py.
    block: split-half pairing width (None = K, the whole contraction)."""
    x = np.asarray(w)
    K = x.shape[-2]
    b = K if block is None else block
    assert K % b == 0 and b % 2 == 0, (K, block)
    o = x.min(axis=-1).astype(np.float64)   # [..., K]
    span = x.max(axis=-1).astype(np.float64) - o
    r = np.where(span > 0, span, 15.0) / 15.0
    codes = np.empty(x.shape, np.uint8)
    fmean = np.empty(o.shape, np.float64)
    for idx in (np.ndindex(x.shape[:-2]) if x.ndim > 2 else [()]):
        q = (x[idx] - o[idx][..., None]) / r[idx][..., None]
        qr = np.clip(np.rint(q), 0, 15)
        codes[idx] = qr.astype(np.uint8)
        fmean[idx] = (q - qr).mean(axis=-1)
    o = o + fmean * r + 8.0 * r             # signed centering folded in
    # per-block split-half: within each b-row block, row i pairs with
    # i + b/2 (b == K reproduces the global layout)
    lead, O = x.shape[:-2], x.shape[-1]
    cb = codes.reshape(lead + (K // b, b, O))
    lo = cb[..., : b // 2, :]                         # unsigned q
    hi = (cb[..., b // 2:, :] - 8) & 0xF              # two's-compl. q-8
    packed = (((hi << 4) | lo).astype(np.uint8).view(np.int8)
              .reshape(lead + (K // 2, O)))
    if as_numpy:
        return Quant4Linear(wp=packed, scale=r.astype(np.float32),
                            offset=o.astype(np.float32), block=block)
    return Quant4Linear(
        wp=jnp.asarray(packed),
        scale=jnp.asarray(r, dtype=jnp.float32),
        offset=jnp.asarray(o, dtype=jnp.float32),
        block=block,
    )


def unpack4(wp: jax.Array, block: int | None = None) -> jax.Array:
    """Centered int32 weights [-8, 7] from the packed [..., K/2, O] int8.

    XLA path (tests / prefill); the Pallas kernel unpacks in-register with
    the shift-free trick (ops/pallas/mm4.py docstring). block must match
    the quantize4 packing."""
    p32 = wp.astype(jnp.int32)              # sign-extends
    low = p32 & 0xF
    w_lo = low - 8                          # block rows [0, b/2)
    w_hi = (p32 - low) >> 4                 # exact: 16*(q-8) / 16
    K2, O = wp.shape[-2], wp.shape[-1]
    b2 = K2 if block is None else block // 2
    lead = wp.shape[:-2]
    w_lo = w_lo.reshape(lead + (K2 // b2, b2, O))
    w_hi = w_hi.reshape(lead + (K2 // b2, b2, O))
    return jnp.concatenate([w_lo, w_hi], axis=-2).reshape(
        lead + (2 * K2, O))


def dequantize4(q: Quant4Linear, dtype=jnp.float32) -> jax.Array:
    """Materialize the dense weight (tests/debug only)."""
    return (
        unpack4(q.wp, q.block).astype(dtype)
        * q.scale[..., None].astype(dtype)
        + q.offset[..., None].astype(dtype)
    )


# q4matmul auto-variant crossover, keyed on min(K, O) — BOTH matmul dims
# (round-5 measurement, BENCH_NOTES). Round 4's K-only predicate
# mis-dispatched 430M's ffn.v (K=4096 but O=1024): two_dot there dropped
# 430M q4 prefill to 102.5k vs all-unpack's 117k tok/s, while 1.5B
# (every family min-dim 2048) measured two_dot everywhere at 41.9k vs
# unpack's 39.0k (+7.3%) and 7B (min-dim 4096) at 1.66x. The [K/2, O]
# nibble-select operand + the activation fold need width in both dims to
# beat the fused small unpack. Per-call shapes also mean TP sharding
# (which shrinks one dim per shard) naturally demotes narrow shards to
# unpack. Override at import with RWKV_TPU_Q4_MIN_K, or at runtime with
# set_q4_two_dot_min_k() (what tools/q4_prefill_probe.py uses).
_Q4_TWO_DOT_MIN_K = int(os.environ.get("RWKV_TPU_Q4_MIN_K", "2048"))

_Q4_VARIANTS = ("auto", "two_dot", "two_dot_i8", "unpack")

# Which two-dot implementation "auto" dispatches to above the crossover:
# 'two_dot' (the measured default) or 'two_dot_i8' (int8-pinned nibble
# materialization — measured SLOWER at 7B, 0.877x vs 0.952x q8, round-5
# A/B; kept as a re-probe lever). Env: RWKV_TPU_Q4_TWO_DOT_IMPL.
_Q4_TWO_DOT_IMPL = os.environ.get("RWKV_TPU_Q4_TWO_DOT_IMPL", "two_dot")
if _Q4_TWO_DOT_IMPL not in ("two_dot", "two_dot_i8"):
    # fail loudly at import: a typo'd env value would otherwise make
    # 'auto' silently dispatch every above-crossover call to 'unpack'
    # and mislabel an A/B cell (the same silent-fallback the explicit
    # variant ValueError guards against).
    raise ValueError(
        "RWKV_TPU_Q4_TWO_DOT_IMPL must be 'two_dot' or 'two_dot_i8', "
        f"got {_Q4_TWO_DOT_IMPL!r}"
    )


def set_q4_two_dot_min_k(k: int) -> int:
    """Set the q4matmul auto-variant crossover; returns the previous value.

    The documented hook for probes/tests (tools/q4_prefill_probe.py's
    PROBE_Q4_MINK flows through here) — callers must not reach into the
    private module global. 0 forces two_dot everywhere; a huge value
    forces unpack."""
    global _Q4_TWO_DOT_MIN_K
    prev = _Q4_TWO_DOT_MIN_K
    _Q4_TWO_DOT_MIN_K = int(k)
    return prev


def q4matmul(
    x: jax.Array,
    q: Quant4Linear,
    *,
    compute_dtype=jnp.float32,
    variant: str = "auto",
) -> jax.Array:
    """y = x @ dequant4(q) via the rank-1 decomposition (XLA path).

    x: [..., K]. Returns [..., O] float32. Same identity as qmatmul:
    y = (x*r) @ centered + x . offset.

    variant="two_dot" is the XLA port of the decode kernel's identity
    (ops/pallas/mm4.py): never materialize the [K, O] dense unpack —
    fold the high-half activations into the low half and run two
    depth-K/2 dots against (wp & 0xF) and wp itself,

        y = (a_lo - a_hi/16) @ low + (a_hi/16) @ pb - 8*rowsum(a_lo),

    where a_lo/a_hi are the xs entries feeding each block's low/high
    nibble rows (a reshape — the packing is block-major, Quant4Linear
    docstring). Weight-side HBM work drops from writing+reading a
    2-byte/weight dense copy to one 0.5-byte/weight nibble array plus
    the packed bytes' fused widening. variant="unpack" keeps the
    dense-unpack dot (the dequantize4 oracle's shape; tests pin the two
    variants equal to bf16 rounding).

    variant="two_dot_i8" is two_dot with the nibble-select operand's
    materialization PINNED at int8 (optimization_barrier between the
    `& 0xF` and the convert): plain two_dot lets XLA fuse and+convert,
    which materializes the [K/2, O] array at compute_dtype — 2 bytes per
    packed byte written and read back per call, the suspected residual
    behind q4 prefill's 3-5% gap vs q8 (BENCH_NOTES round-4). MEASURED
    SLOWER at 7B (round-5 A/B: 0.877x q8 vs two_dot's 0.952x) — the
    barrier costs more fusion than the byte-width pin saves. Kept as a
    selectable variant for re-probing on XLA bumps; auto never picks it
    unless RWKV_TPU_Q4_TWO_DOT_IMPL overrides.

    variant="auto" (default) picks per call by min(K, O) — BOTH matmul
    dims must clear _Q4_TWO_DOT_MIN_K for two_dot, else unpack. Both
    directions are MEASURED (BENCH_NOTES round-4/5 Q4-prefill cells):
    at 7B (min-dim 4096) two_dot is 1.66x unpack (the dense copy's HBM
    round trip swamps the MXU); at 1.5B (min-dim 2048) +7.3%; at 430M
    (min-dim 1024 in every family — ffn.v is K=4096 but O=1024) it is
    0.89x (the small unpack stays fused and the fold's extra activation
    elementwise dominates) — don't force either globally."""
    if variant not in _Q4_VARIANTS:
        raise ValueError(
            f"q4matmul variant must be one of {_Q4_VARIANTS}, got {variant!r}"
        )
    if variant == "auto":
        variant = (_Q4_TWO_DOT_IMPL
                   if min(x.shape[-1], q.wp.shape[-1]) >= _Q4_TWO_DOT_MIN_K
                   else "unpack")
    xs = x * q.scale
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    kw = dict(preferred_element_type=jnp.float32, precision=prec)
    if variant in ("two_dot", "two_dot_i8"):
        K = x.shape[-1]
        b = K if q.block is None else q.block
        x4 = xs.reshape(*xs.shape[:-1], K // b, b)
        xl = x4[..., : b // 2]                       # low-nibble rows
        xh = x4[..., b // 2:] / 16.0                 # high: fold the *16
        A1 = (xl - xh).reshape(*xs.shape[:-1], K // 2).astype(compute_dtype)
        A2 = xh.reshape(*xs.shape[:-1], K // 2).astype(compute_dtype)
        low_i8 = q.wp & 0xF                          # q_lo in [0, 15]
        if variant == "two_dot_i8":
            # pin the nibble array's materialization at 1 byte (see
            # docstring); without the barrier XLA fuses the convert and
            # materializes at compute_dtype.
            low_i8 = jax.lax.optimization_barrier(low_i8)
        low = low_i8.astype(compute_dtype)
        pb = q.wp.astype(compute_dtype)              # 16*(q_hi-8) + q_lo
        dn = (((x.ndim - 1,), (low.ndim - 2,)), ((), ()))
        main = (jax.lax.dot_general(A1, low, dimension_numbers=dn, **kw)
                + jax.lax.dot_general(A2, pb, dimension_numbers=dn, **kw)
                - 8.0 * jnp.sum(xl, axis=(-2, -1), dtype=jnp.float32,
                                )[..., None])
    else:
        w = unpack4(q.wp, q.block).astype(compute_dtype)
        main = jax.lax.dot_general(
            xs.astype(compute_dtype), w,
            dimension_numbers=(((x.ndim - 1,), (w.ndim - 2,)), ((), ())),
            **kw,
        )
    off = jnp.einsum("...i,...i->...", x, q.offset)[..., None]
    return (main + off).astype(jnp.float32)


def qmatmul(
    x: jax.Array,
    q: QuantLinear,
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """y = x @ dequant(q), without materializing the dequantized matrix.

    x: [..., in] activations. Returns [..., out] in float32.

    Decomposition: (x * scale) @ w  +  (x . offset). The u8->compute_dtype
    widening of `w` is fused by XLA into the dot's read loop, so HBM traffic
    stays 1 byte/weight (the reference fuses identically in its CUDA matvec,
    include/rwkv/cuda/rwkv.cu:290).
    """
    xs = (x * q.scale).astype(compute_dtype)
    # f32 path: HIGHEST precision — at memory-bound (decode) batch sizes the
    # extra MXU passes are free (HBM u8 traffic is the bottleneck), so there
    # is no reason to accept bf16 matmul rounding on top of the quantization
    # noise. bf16 path (compute-bound prefill): single-pass MXU at 4x the
    # f32 rate, f32 accumulation; HIGHEST there would silently re-add the
    # passes and the rate advantage with it.
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    w = q.w
    # regular layout: w has one more dim than scale ([..., in, out] vs
    # [..., in]); pretile_params adds a tile-block dim ([..., O/t, in, t])
    if w.ndim == q.scale.ndim + 2:
        # decode_stack.pretile_params layout [..., O/t, in, t]: contract
        # over `in` with the tile axes as batch/free dims, then flatten.
        # CAVEAT: under a layer scan, XLA assigns the whole stacked weight
        # a dot-friendly layout, materializing a FULL second copy of the
        # large families (~8GB at 14B -> prefill OOM on a 16GB chip). The
        # engine therefore only pretiles models whose copies fit
        # (runtime/engine.py), and bench prefill runs unpretiled.
        nt, t_ = w.shape[-3], w.shape[-1]
        main = jnp.einsum(
            "...i,...nit->...nt", xs, w.astype(compute_dtype),
            precision=prec, preferred_element_type=jnp.float32,
        ).reshape(*x.shape[:-1], nt * t_)
    else:
        main = jax.lax.dot_general(
            xs,
            w.astype(compute_dtype),
            dimension_numbers=(((x.ndim - 1,), (w.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    off = jnp.einsum("...i,...i->...", x, q.offset)[..., None]
    return (main + off).astype(jnp.float32)
