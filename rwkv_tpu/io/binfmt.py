"""Reference-compatible `.bin` checkpoint reader/writer + streaming loader.

File format (converter/cpp_save_tensor.cpp:75-93): two little-endian int64
(n_layer, n_embd) followed by the 46 registry tensors raw, in order. A model
written by the reference converter loads here and vice versa.

Reading is *streaming*: each tensor is memory-mapped, copied out once,
and its mapping closed before the next is touched, so the file never
becomes resident in host RAM (the reference's "direct disk -> GPU,
practically no RAM" property, rwkv.cu:672-711 — here disk -> HBM via
per-tensor mmap + device_put). Host transient = one tensor plus
whatever the PJRT client holds for in-flight transfers (bounded by
RWKV_TPU_LOAD_FLUSH_BYTES); measured numbers in tools/load_rss_probe.py
/ BENCH_NOTES. With a `sharding` argument each tensor lands directly in
its distributed layout.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.io.registry import REGISTRY, VOCAB, file_layout
from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    AttParams,
    FFNParams,
    LNParams,
    RWKVParams,
)
from rwkv_tpu.ops.quant import QuantLinear


def read_header(path: str) -> RWKVConfig:
    with open(path, "rb") as f:
        hdr = np.frombuffer(f.read(16), dtype="<i8")
    if hdr.shape != (2,) or hdr[0] <= 0 or hdr[1] <= 0 or hdr[0] > 1024:
        raise ValueError(f"{path}: not a rwkv .bin file (header {hdr!r})")
    return RWKVConfig(n_layer=int(hdr[0]), n_embd=int(hdr[1]), vocab_size=VOCAB)


def _take_tensor(path: str, layout: dict, name: str,
                 dtype=None) -> np.ndarray:
    """Read ONE registry tensor into an owned host array.

    The tensor is memory-mapped, copied out (converting to `dtype` if
    given), and the mapping is CLOSED before returning — so the file's
    pages leave this process's resident set immediately instead of
    accumulating until the whole checkpoint is resident (measured: the
    hold-all-mmaps layout peaked at 2.4x file size in host RSS on a 1.5B
    load; see tools/load_rss_probe.py)."""
    off, spec = layout[name]
    mm = np.memmap(path, dtype="<" + spec.dtype, mode="r",
                   offset=off, shape=spec.shape)
    arr = mm.astype(dtype) if dtype is not None else np.array(mm)
    raw = mm._mmap
    del mm                      # release the buffer export, then unmap
    raw.close()
    return arr


def read_bin(
    path: str,
    *,
    put: Optional[Callable[[str, np.ndarray], jax.Array]] = None,
    pad_vocab_to: Optional[int] = None,
    pretile: Optional[int] = None,
    signed: bool = False,
) -> RWKVParams:
    """Load a reference-format .bin into RWKVParams (u8 QuantLinear weights).

    `signed=True` re-centers each weight family to int8 ON THE HOST COPY
    before upload (u8 x -> x-128 int8 is the in-place XOR-0x80 bit
    pattern; offsets absorb +128*scale) — the Pallas kernels need int8,
    and doing it at read time means the device NEVER holds u8 and s8
    copies of a family at once. A 14B q8 is 13.5 GB of weights: the
    old upload-then-signedize path ResourceExhausted a 16 GB chip
    (tools/load_rss_probe.py caught it; engine.load_file passes True).

    `put(name, host_array) -> device array` customizes placement (e.g. a
    NamedSharding per tensor for TP loading); default is plain device_put.
    Tensors stream one at a time — the mmap pages are released after each
    device transfer, so host RSS stays ~one tensor.

    `pad_vocab_to`: pad emb rows / head columns up to this multiple (see
    models.rwkv4.pad_vocab) *before* placement, so the vocab dim shards.

    `pretile`: re-layout the column-sliced weight families HOST-SIDE into
    the decode kernel's contiguous-block format [L, O/t, E, t]
    (ops.pallas.decode_stack.pretile_params) before placement — the
    device never holds both layouts, so even a 14B pretile fits; host
    transient stays one tensor.
    """
    cfg = read_header(path)
    a, b = cfg.n_layer, cfg.n_embd
    layout = {
        name: (off, spec._replace(shape=spec.shape(a, b)))
        for (name, off, _), spec in zip(file_layout(a, b), REGISTRY)
    }

    vpad = 0
    if pad_vocab_to:
        vp = ((VOCAB + pad_vocab_to - 1) // pad_vocab_to) * pad_vocab_to
        vpad = vp - VOCAB

    if put is None:
        def put(name, arr):
            return jax.device_put(jnp.asarray(arr))

    _cpu = jax.default_backend() == "cpu"
    # Drain the H2D pipeline after this many un-flushed uploaded bytes: a
    # tiny D2H that DEPENDS on the last tensor bounds the host memory the
    # transfer layer can hold for in-flight copies. The default only fires
    # above ~4 GB uploaded (a 14B load drains ~3 times; smaller models
    # never do) because each drain costs upload/disk overlap — measured
    # 3.1x load wall time when draining every family on the tunneled TPU
    # (whose client retains host mirrors for the buffer lifetime anyway;
    # see tools/load_rss_probe.py and BENCH_NOTES).
    _flush_thresh = int(os.environ.get("RWKV_TPU_LOAD_FLUSH_BYTES",
                                       4 << 30))
    _pending = [0]

    def _flush(dev, nbytes):
        _pending[0] += nbytes
        if not _cpu and _pending[0] >= _flush_thresh:
            np.asarray(dev[(0,) * dev.ndim])
            _pending[0] = 0
        return dev

    def take(name, dtype=None):
        return _take_tensor(path, layout, name, dtype)

    def f32(name):
        return put(name, take(name, np.float32))

    COL_FAMILIES = ("km", "vm", "rm", "ffn_r", "ffn_k")

    def qlin(wname, rname, oname) -> QuantLinear:
        w = take(wname)
        if wname == "head" and vpad:
            w = np.pad(w, ((0, 0), (0, vpad)))
        if signed:
            w ^= 0x80            # in place on the owned copy; pad bytes
            w = w.view(np.int8)  # 0x00 -> -128, same as the device path
        if pretile and wname in COL_FAMILIES:
            Lw, K, O = w.shape
            w = np.ascontiguousarray(
                w.reshape(Lw, K, O // pretile, pretile).transpose(0, 2, 1, 3)
            )
        dev = _flush(put(wname, w), w.nbytes)
        del w
        scale = take(rname, np.float32)
        offset = take(oname, np.float32)
        if signed:
            offset += np.float32(128.0) * scale
        return QuantLinear(w=dev, scale=put(rname, scale),
                           offset=put(oname, offset))

    ln = take("layernorms", np.float32)  # [4(L+1), E]
    L = cfg.n_layer
    # Packing (converter convert_model.py:30-46 / kernel offsets rwkv.cu:533):
    # rows 0,1 = ln0 w,b; rows 4i+2,4i+3 = ln1_i; rows 4i+4,4i+5 = ln2_i;
    # rows 4L+2,4L+3 = ln_out.
    idx = np.arange(L)

    emb_host = take("embed", np.float32)
    logit_bias = None
    if vpad:
        emb_host = np.pad(emb_host, ((0, vpad), (0, 0)))
        bias = np.zeros((VOCAB + vpad,), np.float32)
        bias[VOCAB:] = -1e9
        logit_bias = put("logit_bias", bias)
    emb_dev = _flush(put("embed", emb_host), emb_host.nbytes)
    del emb_host

    params = RWKVParams(
        emb=emb_dev,
        ln0=LNParams(put("ln0.w", ln[0]), put("ln0.b", ln[1])),
        ln1=LNParams(put("ln1.w", ln[4 * idx + 2]), put("ln1.b", ln[4 * idx + 3])),
        ln2=LNParams(put("ln2.w", ln[4 * idx + 4]), put("ln2.b", ln[4 * idx + 5])),
        att=AttParams(
            mix_k=f32("mix_k"),
            mix_v=f32("mix_v"),
            mix_r=f32("mix_r"),
            key=qlin("km", "kr", "o1"),
            value=qlin("vm", "vr", "o2"),
            receptance=qlin("rm", "rr", "o3"),
            output=qlin("att_out", "att_out_r", "att_out_o"),
            decay=f32("decay"),
            bonus=f32("bonus"),
        ),
        ffn=FFNParams(
            mix_k=f32("ffn_mix_k"),
            mix_r=f32("ffn_mix_v"),  # registry quirk: slot holds time_mix_r
            key=qlin("ffn_k", "ffn_kr", "ffn_ko"),
            value=qlin("ffn_v", "ffn_vr", "ffn_vo"),
            receptance=qlin("ffn_r", "ffn_rr", "ffn_ro"),
        ),
        ln_out=LNParams(put("ln_out.w", ln[4 * L + 2]), put("ln_out.b", ln[4 * L + 3])),
        head=qlin("head", "head_r", "head_o"),
        logit_bias=logit_bias,
    )
    return params


def write_bin(path: str, params: RWKVParams) -> None:
    """Write RWKVParams (quantized, vocab 50277) as a reference-format .bin."""
    cfg = params.config
    if cfg.vocab_size < VOCAB:
        raise ValueError(f".bin format requires vocab {VOCAB}, got {cfg.vocab_size}")
    for name in ("key", "value", "receptance", "output"):
        if not isinstance(getattr(params.att, name), QuantLinear):
            raise ValueError("write_bin requires quantized params (quantize_params)")
    a, b = cfg.n_layer, cfg.n_embd

    def h(x, dt):
        return np.ascontiguousarray(np.asarray(x), dtype=dt)

    # strip any vocab padding (pad_vocab) back to the canonical 50277
    emb_out = h(params.emb, "<f4")[:VOCAB]
    head_w_out = h(params.head.w, "u1")[:, :VOCAB]

    ln = np.zeros((4 * (a + 1), b), dtype="<f8")
    ln[0], ln[1] = h(params.ln0.weight, "f8"), h(params.ln0.bias, "f8")
    idx = np.arange(a)
    ln[4 * idx + 2] = h(params.ln1.weight, "f8")
    ln[4 * idx + 3] = h(params.ln1.bias, "f8")
    ln[4 * idx + 4] = h(params.ln2.weight, "f8")
    ln[4 * idx + 5] = h(params.ln2.bias, "f8")
    ln[4 * a + 2], ln[4 * a + 3] = h(params.ln_out.weight, "f8"), h(params.ln_out.bias, "f8")

    empty = np.zeros((a, b), dtype="<f8")
    # -1e30 via a float32 round-trip: the reference converter builds the
    # empty state from a default-dtype (f32) torch tensor before .double()
    # (convert_model.py:19-25), so the stored f64 is f32(-1e30) widened —
    # matching it makes our .bin BYTE-IDENTICAL to the reference
    # converter's (pinned in tests/test_convert.py).
    neg = np.full((a, b), np.float32(-1e30), dtype="<f8")

    data = {
        # scratch rows: readers ignore the content, but the reference
        # writes torch.arange (convert_model.py:99-106) — mirror it for
        # byte-identical output
        "xbuf": np.arange(b, dtype="<f8"),
        "embed": emb_out,
        "layernorms": ln,
        "state_xy": empty, "state_aa": empty, "state_bb": empty,
        "state_pp": neg, "state_dd": empty,
        "buffer1": np.arange(b, dtype="<f8"),
        "buffer2": np.arange(VOCAB, dtype="<f4"),
        "buffer3": np.arange(b, dtype="<f4"),
        "buffer4": np.arange(b, dtype="<f4"),
        "mix_k": h(params.att.mix_k, "<f8"),
        "mix_v": h(params.att.mix_v, "<f8"),
        "mix_r": h(params.att.mix_r, "<f8"),
        "km": h(params.att.key.w, "u1"),
        "vm": h(params.att.value.w, "u1"),
        "rm": h(params.att.receptance.w, "u1"),
        "kr": h(params.att.key.scale, "<f4"),
        "vr": h(params.att.value.scale, "<f4"),
        "rr": h(params.att.receptance.scale, "<f4"),
        "o1": h(params.att.key.offset, "<f4"),
        "o2": h(params.att.value.offset, "<f4"),
        "o3": h(params.att.receptance.offset, "<f4"),
        "att_out": h(params.att.output.w, "u1"),
        "att_out_r": h(params.att.output.scale, "<f4"),
        "att_out_o": h(params.att.output.offset, "<f4"),
        "ffn_mix_k": h(params.ffn.mix_k, "<f8"),
        "ffn_mix_v": h(params.ffn.mix_r, "<f8"),  # quirk: slot holds mix_r
        "ffn_k": h(params.ffn.key.w, "u1"),
        "ffn_v": h(params.ffn.value.w, "u1"),
        "ffn_r": h(params.ffn.receptance.w, "u1"),
        "ffn_kr": h(params.ffn.key.scale, "<f4"),
        "ffn_vr": h(params.ffn.value.scale, "<f4"),
        "ffn_rr": h(params.ffn.receptance.scale, "<f4"),
        "ffn_ko": h(params.ffn.key.offset, "<f4"),
        "ffn_vo": h(params.ffn.value.offset, "<f4"),
        "ffn_ro": h(params.ffn.receptance.offset, "<f4"),
        "ffn_k_buffer": np.arange(b, dtype="<f8"),
        "ffn_v_buffer": np.arange(b, dtype="<f8"),
        "ffn_r_buffer": np.arange(4 * b, dtype="<f4"),
        "decay": h(params.att.decay, "<f8"),
        "bonus": h(params.att.bonus, "<f8"),
        "head": head_w_out,
        "head_r": h(params.head.scale, "<f4"),
        "head_o": h(params.head.offset, "<f4"),
    }

    with open(path, "wb") as f:
        f.write(np.asarray([a, b], dtype="<i8").tobytes())
        for spec in REGISTRY:
            arr = data[spec.name]
            expected = spec.shape(a, b)
            if tuple(arr.shape) != tuple(expected):
                raise ValueError(f"{spec.name}: shape {arr.shape} != {expected}")
            f.write(arr.tobytes())


def write_bin_streaming(path: str, n_layer: int, n_embd: int, get) -> None:
    """Write a .bin producing one tensor at a time: `get(spec)` returns the
    numpy array for each REGISTRY entry in file order and is freed before
    the next is requested — peak RAM is one tensor (plus whatever the
    provider caches). The offline converter uses this to turn a 14B .pth
    into a .bin in ~one-quantized-family of host memory, which the
    reference converter (full torch state dict resident) cannot do."""
    a, b = n_layer, n_embd
    with open(path, "wb") as f:
        f.write(np.asarray([a, b], dtype="<i8").tobytes())
        for spec in REGISTRY:
            arr = np.ascontiguousarray(np.asarray(get(spec)),
                                       dtype="<" + spec.dtype
                                       if spec.dtype != "u1" else "u1")
            expected = spec.shape(a, b)
            if tuple(arr.shape) != tuple(expected):
                raise ValueError(f"{spec.name}: shape {arr.shape} != {expected}")
            f.write(arr.tobytes())
            del arr
