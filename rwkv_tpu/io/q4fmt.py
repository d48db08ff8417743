"""Packed-4-bit checkpoint artifact: quantize once, restart fast.

The reference ships one checkpoint format (Q8_0 .bin,
converter/cpp_save_tensor.cpp) matching its one quant scheme. The q4
serving path (beyond-reference, BENCH_NOTES round-4) had no artifact:
every server start re-read the DENSE .pth/.safetensors source and
re-quantized — minutes of host work and ~4x the artifact bytes of IO at
14B. This module makes packed q4 params a first-class checkpoint:

  save_q4(path, params)   # params from quantize_params_q4 /
                          # load_checkpoint_quantized(bits=4)
  load_q4(path)           # -> RWKVParams with numpy leaves, mmap-backed
                          #    reads (no torch, no requantize)

Container: a standard .safetensors file (io/safetensors.py writer —
readable by any safetensors tool) with `__metadata__.format =
"rwkv-tpu-q4/1"` and one entry per leaf. Quant4Linear packing metadata
(the per-family split-half `block`, ops/quant.py:158-163) rides in
metadata; the row-tiled families' block must equal the decode kernel
tile, so load-time validation belongs to the engine (decode_stack's
VMEM/shape pre-checks), not here.

Engine integration: `RWKV(quant='q4').load_file(x)` detects the format
tag on any .safetensors input and loads packed directly.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from rwkv_tpu.models.rwkv4 import (
    AttParams,
    FFNParams,
    LNParams,
    RWKVParams,
)
from rwkv_tpu.ops.quant import Quant4Linear

FORMAT_TAG = "rwkv-tpu-q4/1"

# Quant4Linear families, artifact name -> pytree path
_Q4_FAMS = (
    "att.key", "att.value", "att.receptance", "att.output",
    "ffn.key", "ffn.value", "ffn.receptance", "head",
)
_PLAIN = (
    "emb",
    "ln0.weight", "ln0.bias", "ln1.weight", "ln1.bias",
    "ln2.weight", "ln2.bias", "ln_out.weight", "ln_out.bias",
    "att.mix_k", "att.mix_v", "att.mix_r", "att.decay", "att.bonus",
    "ffn.mix_k", "ffn.mix_r",
)


def _get(params: RWKVParams, dotted: str):
    obj = params
    for part in dotted.split("."):
        obj = getattr(obj, part)
    return obj


def save_q4(path: str, params: RWKVParams) -> None:
    """Write packed-q4 RWKVParams as a tagged .safetensors artifact."""
    from rwkv_tpu.io.safetensors import write_safetensors

    blocks = {}
    tensors = {}
    for fam in _Q4_FAMS:
        lin = _get(params, fam)
        if not isinstance(lin, Quant4Linear):
            raise TypeError(
                f"save_q4 requires ALL matrix families packed 4-bit "
                f"(quantize_params_q4); {fam} is {type(lin).__name__}")
        tensors[fam + ".wp"] = np.asarray(lin.wp)
        tensors[fam + ".scale"] = np.asarray(lin.scale)
        tensors[fam + ".offset"] = np.asarray(lin.offset)
        blocks[fam] = lin.block
    for name in _PLAIN:
        tensors[name] = np.asarray(_get(params, name))
    if params.logit_bias is not None:
        tensors["logit_bias"] = np.asarray(params.logit_bias)
    meta = {
        "format": FORMAT_TAG,
        "n_layer": str(params.n_layer),
        "n_embd": str(params.n_embd),
        "vocab_size": str(params.config.vocab_size),
        "blocks": json.dumps(blocks),
    }
    write_safetensors(path, tensors, metadata=meta)


def is_q4_file(path: str) -> bool:
    """True if `path` is a .safetensors carrying the q4 format tag."""
    from rwkv_tpu.io.safetensors import SafetensorsFile

    if not path.endswith(".safetensors"):
        return False
    try:
        f = SafetensorsFile(path)
    except (ValueError, OSError):
        return False
    try:
        return f.metadata.get("format") == FORMAT_TAG
    finally:
        f.close()


def load_q4(path: str) -> RWKVParams:
    """Read a save_q4 artifact back into RWKVParams (numpy leaves).

    Leaves are owned copies read family-by-family from the mmap'd file
    with pages released between reads (same host-RSS discipline as
    binfmt._take_tensor; the artifact is ~0.5 GB/B-param so even a 14B
    is a ~7 GB read)."""
    from rwkv_tpu.io.safetensors import SafetensorsFile

    f = SafetensorsFile(path)
    try:
        meta = f.metadata
        if meta.get("format") != FORMAT_TAG:
            raise ValueError(
                f"{path}: not a {FORMAT_TAG} artifact "
                f"(format={meta.get('format')!r}); for dense checkpoints "
                "use RWKV(quant='q4').load_file which quantizes on the fly")
        blocks = json.loads(meta["blocks"])

        def arr(name):
            a = np.array(f[name])   # owned copy off the mapping
            f.release()
            return a

        def q4(fam):
            return Quant4Linear(
                wp=arr(fam + ".wp"), scale=arr(fam + ".scale"),
                offset=arr(fam + ".offset"), block=blocks[fam],
            )

        def ln(prefix):
            return LNParams(arr(prefix + ".weight"), arr(prefix + ".bias"))

        params = RWKVParams(
            emb=arr("emb"),
            ln0=ln("ln0"), ln1=ln("ln1"), ln2=ln("ln2"),
            att=AttParams(
                mix_k=arr("att.mix_k"), mix_v=arr("att.mix_v"),
                mix_r=arr("att.mix_r"),
                key=q4("att.key"), value=q4("att.value"),
                receptance=q4("att.receptance"), output=q4("att.output"),
                decay=arr("att.decay"), bonus=arr("att.bonus"),
            ),
            ffn=FFNParams(
                mix_k=arr("ffn.mix_k"), mix_r=arr("ffn.mix_r"),
                key=q4("ffn.key"), value=q4("ffn.value"),
                receptance=q4("ffn.receptance"),
            ),
            ln_out=ln("ln_out"),
            head=q4("head"),
            logit_bias=arr("logit_bias") if "logit_bias" in f else None,
        )
        exp = (int(meta["n_layer"]), int(meta["n_embd"]))
        got = (params.n_layer, params.n_embd)
        if got != exp:
            raise ValueError(f"{path}: header says {exp}, tensors say {got}")
        return params
    finally:
        f.close()
