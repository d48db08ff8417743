"""Offline converter: RWKV-v4 .pth / .safetensors -> quantized checkpoint.

Equivalent of the reference's converter/convert_model.py, minus the libtorch
C++ serializer (io/binfmt.py writes the identical format in numpy). torch is
imported lazily and only used to deserialize .pth pickles on CPU;
.safetensors checkpoints (native BlinkDL names or HF-transformers
`RwkvForCausalLM` names) are read torch-free via io/safetensors.py —
beyond-reference scope (the reference accepts only .pth,
convert_model.py:24).

Semantics preserved:
  * decay = -exp(time_decay) baked in at convert time (convert_model.py:58)
  * mixes/layernorms pass through; 7 matrix families + head quantized to
    per-input-channel affine u8 (ops/quant.py == convert_model.py:108-119)
  * weights transposed to [in, out] matmul layout
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    AttParams,
    FFNParams,
    LNParams,
    RWKVParams,
    quantize_params,
)

REQUIRED_KEYS = (
    "emb.weight",
    "ln_out.weight",
    "ln_out.bias",
    "blocks.0.ln0.weight",
    "blocks.0.ln0.bias",
    "head.weight",
)


def _npf(t):
    """Tensor (torch or numpy) -> float32 ndarray."""
    if isinstance(t, np.ndarray):
        return np.asarray(t, dtype=np.float32)
    return np.asarray(t.float().numpy(), dtype=np.float32)


def _tT(t):
    """[out, in] weight (torch or numpy) -> contiguous float32 [in, out].
    torch's blocked transpose is ~10x numpy's naive strided copy, so keep
    torch tensors on the torch path (the converter is memory-bound)."""
    if isinstance(t, np.ndarray):
        return np.ascontiguousarray(np.asarray(t, np.float32).T)
    return t.float().t().contiguous().numpy()


def _load_weights(path: str, mmap_ok: bool = False):
    """Open a checkpoint as a BlinkDL-keyed mapping: .safetensors via the
    torch-free reader (HF names auto-translated), anything else as a torch
    .pth pickle."""
    if path.endswith(".safetensors"):
        from rwkv_tpu.io.safetensors import open_checkpoint

        return open_checkpoint(path)
    import torch

    if mmap_ok:
        try:
            return torch.load(path, map_location="cpu", weights_only=True,
                              mmap=True)
        except (TypeError, RuntimeError):  # pre-zipfile checkpoints: no mmap
            pass
    return torch.load(path, map_location="cpu", weights_only=True)


def checkpoint_dims(path: str) -> tuple[int, int, int]:
    """(n_layer, n_embd, vocab) from a .pth/.safetensors checkpoint,
    reading shapes only (mmap'd; no tensor data materialized). Lets the
    engine pick quantization tiles before the streaming load."""
    w = _load_weights(path, mmap_ok=True)
    if "emb.weight" not in w or "blocks.0.att.key.weight" not in w:
        raise ValueError(f"{path}: not an RWKV-v4 checkpoint")
    L = sum(1 for k in w if "blocks" in k and "ln1.bias" in k)
    E = w["blocks.0.att.key.weight"].shape[1]
    vocab = w["emb.weight"].shape[0]
    return L, E, vocab


def load_pth(path: str) -> RWKVParams:
    """Read a BlinkDL RWKV-v4 .pth or .safetensors into dense float32
    RWKVParams."""
    w = _load_weights(path)
    missing = [k for k in REQUIRED_KEYS if k not in w]
    if missing:
        raise ValueError(f"{path}: not an RWKV-v4 checkpoint; missing {missing}")

    n_embd = w["blocks.0.att.key.weight"].shape[1]
    n_layer = sum(1 for k in w if "blocks" in k and "ln1.bias" in k)
    vocab = w["emb.weight"].shape[0]
    cfg = RWKVConfig(n_layer=n_layer, n_embd=n_embd, vocab_size=vocab)

    npf = _npf

    def stack(fmt, transform=npf):
        return np.stack([transform(w[fmt.format(i)]) for i in range(n_layer)])

    def stack_sq(fmt):
        return stack(fmt, lambda t: npf(t).reshape(-1))

    def tT(name):
        return _tT(w[name])

    def stack_t(fmt):
        # torch Linear weight is [out, in]; our matmul layout is [in, out]:
        # preallocate [L, in, out], transpose in torch, memcpy in place
        first = tT(fmt.format(0))
        out = np.empty((n_layer,) + first.shape, np.float32)
        out[0] = first
        for i in range(1, n_layer):
            out[i] = tT(fmt.format(i))
        return out

    params = RWKVParams(
        emb=npf(w["emb.weight"]),
        ln0=LNParams(npf(w["blocks.0.ln0.weight"]), npf(w["blocks.0.ln0.bias"])),
        ln1=LNParams(stack("blocks.{}.ln1.weight"), stack("blocks.{}.ln1.bias")),
        ln2=LNParams(stack("blocks.{}.ln2.weight"), stack("blocks.{}.ln2.bias")),
        att=AttParams(
            mix_k=stack_sq("blocks.{}.att.time_mix_k"),
            mix_v=stack_sq("blocks.{}.att.time_mix_v"),
            mix_r=stack_sq("blocks.{}.att.time_mix_r"),
            key=stack_t("blocks.{}.att.key.weight"),
            value=stack_t("blocks.{}.att.value.weight"),
            receptance=stack_t("blocks.{}.att.receptance.weight"),
            output=stack_t("blocks.{}.att.output.weight"),
            decay=-np.exp(
                stack_sq("blocks.{}.att.time_decay").astype(np.float64)
            ).astype(np.float32),
            bonus=stack_sq("blocks.{}.att.time_first"),
        ),
        ffn=FFNParams(
            mix_k=stack_sq("blocks.{}.ffn.time_mix_k"),
            mix_r=stack_sq("blocks.{}.ffn.time_mix_r"),
            key=stack_t("blocks.{}.ffn.key.weight"),
            value=stack_t("blocks.{}.ffn.value.weight"),
            receptance=stack_t("blocks.{}.ffn.receptance.weight"),
        ),
        ln_out=LNParams(npf(w["ln_out.weight"]), npf(w["ln_out.bias"])),
        head=tT("head.weight"),
    )
    assert params.config == cfg
    return params


# .safetensors is first-class: same loader, clearer name for new callers.
load_checkpoint = load_pth


def load_checkpoint_quantized(
    path: str, bits: int = 8, q4_tile: int | None = None,
) -> RWKVParams:
    """Quantized RWKVParams straight from a checkpoint file, streaming the
    8 matrix families layer-by-layer from the mmap'd source: peak host RAM
    ~ the final (quantized) pytree + ONE dense [in, out] layer, vs
    quantize_params(load_checkpoint(...))'s two full dense-float32 copies
    (a 14B would need ~2x56 GB host RAM that way; this loads in ~15 GB —
    the same per-family streaming discipline as convert()). Per-layer
    quantization is bit-identical to the whole-family call
    (tests/test_convert.py pins it through the .bin byte-parity gate).

    bits=4: nibble-packed Quant4Linear families (half the device HBM of
    Q8, 1.4-1.9x decode — BENCH_NOTES round-4). q4_tile must match the
    decode kernel tile (default pick_tile_q4(E)); it sets the row-tiled
    families' per-tile packing (ops.quant.quantize4 block)."""
    from rwkv_tpu.ops.quant import Quant4Linear, QuantLinear, quantize
    from rwkv_tpu.ops.quant import quantize4

    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    w = _load_weights(path, mmap_ok=True)
    missing = [k for k in REQUIRED_KEYS if k not in w]
    if missing:
        raise ValueError(
            f"{path}: not an RWKV-v4 checkpoint; missing {missing}")
    L = sum(1 for k in w if "blocks" in k and "ln1.bias" in k)
    E = w["blocks.0.att.key.weight"].shape[1]
    vocab = w["emb.weight"].shape[0]
    if bits == 4 and q4_tile is None:
        if E % 128 == 0:
            from rwkv_tpu.ops.pallas.decode_stack import pick_tile_q4

            q4_tile = pick_tile_q4(E)
        else:
            q4_tile = E  # sub-lane-width model: kernel never runs; tag at E

    npf = _npf

    def rel():
        # drop the source mapping's resident pages between families so the
        # dense checkpoint never accumulates in host RSS on top of the
        # quantized pytree (a 14B bf16 source is ~28 GB; safetensors only —
        # the torch .pth mmap has no release hook)
        r = getattr(w, "release", None)
        if r is not None:
            r()

    def stack(fmt, transform=npf):
        return np.stack([transform(w[fmt.format(i)]) for i in range(L)])

    def stack_sq(fmt):
        return stack(fmt, lambda t: npf(t).reshape(-1))

    def qfam(fmt, row_tiled: bool = False):
        if bits == 4:
            block = q4_tile if row_tiled else None
            qs = scs = ofs = None
            for i in range(L):
                q = quantize4(_tT(w[fmt.format(i)]), block=block,
                              as_numpy=True)
                if qs is None:
                    qs = np.empty((L,) + q.wp.shape, np.int8)
                    scs = np.empty((L,) + q.scale.shape, np.float32)
                    ofs = np.empty((L,) + q.offset.shape, np.float32)
                qs[i], scs[i], ofs[i] = q.wp, q.scale, q.offset
            rel()
            return Quant4Linear(qs, scs, ofs, block=block)
        qs = scs = ofs = None
        for i in range(L):
            q = quantize(_tT(w[fmt.format(i)]), as_numpy=True)
            if qs is None:
                qs = np.empty((L,) + q.w.shape, np.uint8)
                scs = np.empty((L,) + q.scale.shape, np.float32)
                ofs = np.empty((L,) + q.offset.shape, np.float32)
            qs[i], scs[i], ofs[i] = q.w, q.scale, q.offset
        rel()
        return QuantLinear(qs, scs, ofs)

    params = RWKVParams(
        emb=npf(w["emb.weight"]),
        ln0=LNParams(npf(w["blocks.0.ln0.weight"]),
                     npf(w["blocks.0.ln0.bias"])),
        ln1=LNParams(stack("blocks.{}.ln1.weight"),
                     stack("blocks.{}.ln1.bias")),
        ln2=LNParams(stack("blocks.{}.ln2.weight"),
                     stack("blocks.{}.ln2.bias")),
        att=AttParams(
            mix_k=stack_sq("blocks.{}.att.time_mix_k"),
            mix_v=stack_sq("blocks.{}.att.time_mix_v"),
            mix_r=stack_sq("blocks.{}.att.time_mix_r"),
            key=qfam("blocks.{}.att.key.weight"),
            value=qfam("blocks.{}.att.value.weight"),
            receptance=qfam("blocks.{}.att.receptance.weight"),
            output=qfam("blocks.{}.att.output.weight", row_tiled=True),
            decay=-np.exp(
                stack_sq("blocks.{}.att.time_decay").astype(np.float64)
            ).astype(np.float32),
            bonus=stack_sq("blocks.{}.att.time_first"),
        ),
        ffn=FFNParams(
            mix_k=stack_sq("blocks.{}.ffn.time_mix_k"),
            mix_r=stack_sq("blocks.{}.ffn.time_mix_r"),
            key=qfam("blocks.{}.ffn.key.weight"),
            value=qfam("blocks.{}.ffn.value.weight", row_tiled=True),
            receptance=qfam("blocks.{}.ffn.receptance.weight"),
        ),
        ln_out=LNParams(npf(w["ln_out.weight"]), npf(w["ln_out.bias"])),
        head=(quantize4(_tT(w["head.weight"]), as_numpy=True) if bits == 4
              else quantize(_tT(w["head.weight"]), as_numpy=True)),
    )
    assert params.config == RWKVConfig(n_layer=L, n_embd=E, vocab_size=vocab)
    return params


# .bin quant-family triplets -> (.pth key template, has layer dim)
_FAMILIES = {
    "km":      ("blocks.{}.att.key.weight", True),
    "vm":      ("blocks.{}.att.value.weight", True),
    "rm":      ("blocks.{}.att.receptance.weight", True),
    "att_out": ("blocks.{}.att.output.weight", True),
    "ffn_k":   ("blocks.{}.ffn.key.weight", True),
    "ffn_v":   ("blocks.{}.ffn.value.weight", True),
    "ffn_r":   ("blocks.{}.ffn.receptance.weight", True),
    "head":    ("head.weight", False),
}
_TRIPLETS = {  # w name -> (scale name, offset name)
    "km": ("kr", "o1"), "vm": ("vr", "o2"), "rm": ("rr", "o3"),
    "att_out": ("att_out_r", "att_out_o"),
    "ffn_k": ("ffn_kr", "ffn_ko"), "ffn_v": ("ffn_vr", "ffn_vo"),
    "ffn_r": ("ffn_rr", "ffn_ro"), "head": ("head_r", "head_o"),
}


def convert(pth_path: str, out_path: str) -> None:
    """Streaming .pth -> .bin: tensors are produced in file order and freed
    as written; weight families quantize layer-by-layer directly from the
    mmap'd checkpoint. Peak host RAM ~ one quantized family (a 14B converts
    in a few GB; the reference converter keeps the whole dense state dict
    resident). .safetensors inputs stream the same way, zero-copy from the
    mmap'd data section, with no torch dependency at all."""
    from rwkv_tpu.io.binfmt import write_bin_streaming
    from rwkv_tpu.ops.quant import quantize

    print(f"loading {pth_path} (mmap) ...", file=sys.stderr)
    w = _load_weights(pth_path, mmap_ok=True)
    missing = [k for k in REQUIRED_KEYS if k not in w]
    if missing:
        raise ValueError(
            f"{pth_path}: not an RWKV-v4 checkpoint; missing {missing}")
    L = sum(1 for k in w if "blocks" in k and "ln1.bias" in k)
    E = w["blocks.0.att.key.weight"].shape[1]
    print(f"model: L={L} E={E} V={w['emb.weight'].shape[0]}; "
          f"converting (streaming) ...", file=sys.stderr)

    npf = _npf

    def stack_sq(fmt):
        return np.stack([npf(w[fmt.format(i)]).reshape(-1) for i in range(L)])

    def layernorms():
        ln = np.zeros((4 * (L + 1), E), np.float64)
        ln[0] = npf(w["blocks.0.ln0.weight"]); ln[1] = npf(w["blocks.0.ln0.bias"])
        for i in range(L):
            ln[4 * i + 2] = npf(w[f"blocks.{i}.ln1.weight"])
            ln[4 * i + 3] = npf(w[f"blocks.{i}.ln1.bias"])
            ln[4 * i + 4] = npf(w[f"blocks.{i}.ln2.weight"])
            ln[4 * i + 5] = npf(w[f"blocks.{i}.ln2.bias"])
        ln[4 * L + 2] = npf(w["ln_out.weight"]); ln[4 * L + 3] = npf(w["ln_out.bias"])
        return ln

    cache: dict[str, np.ndarray] = {}

    def quantize_family(wname: str):
        fmt, layered = _FAMILIES[wname]
        sname, oname = _TRIPLETS[wname]
        if layered:
            qs = scs = ofs = None
            for i in range(L):
                dense = _tT(w[fmt.format(i)])
                q = quantize(dense, as_numpy=True)
                if qs is None:
                    qs = np.empty((L,) + q.w.shape, np.uint8)
                    scs = np.empty((L,) + q.scale.shape, np.float32)
                    ofs = np.empty((L,) + q.offset.shape, np.float32)
                qs[i], scs[i], ofs[i] = q.w, q.scale, q.offset
                del dense, q
            cache[wname], cache[sname], cache[oname] = qs, scs, ofs
        else:
            dense = _tT(w[fmt])
            q = quantize(dense, as_numpy=True)
            cache[wname], cache[sname], cache[oname] = q.w, q.scale, q.offset
            del dense

    def get(spec):
        name = spec.name
        if name in cache:
            return cache.pop(name)
        if name in _FAMILIES:
            quantize_family(name)
            return cache.pop(name)
        if name == "embed":
            return npf(w["emb.weight"])
        if name == "layernorms":
            return layernorms()
        if name == "mix_k":
            return stack_sq("blocks.{}.att.time_mix_k")
        if name == "mix_v":
            return stack_sq("blocks.{}.att.time_mix_v")
        if name == "mix_r":
            return stack_sq("blocks.{}.att.time_mix_r")
        if name == "ffn_mix_k":
            return stack_sq("blocks.{}.ffn.time_mix_k")
        if name == "ffn_mix_v":  # registry quirk: slot holds time_mix_r
            return stack_sq("blocks.{}.ffn.time_mix_r")
        if name == "decay":
            return -np.exp(stack_sq("blocks.{}.att.time_decay").astype(np.float64))
        if name == "bonus":
            return stack_sq("blocks.{}.att.time_first")
        if name == "state_pp":
            # f32 round-trip of -1e30: matches the reference converter's
            # default-dtype tensor (see io/binfmt.py) — keeps the output
            # byte-identical to the reference converter's .bin
            return np.full(spec.shape(L, E), np.float32(-1e30))
        if name.endswith("buffer") or name in (
                "xbuf", "buffer1", "buffer2", "buffer3", "buffer4"):
            # scratch rows: content ignored by readers; the reference
            # writes torch.arange — mirror it (byte parity)
            n = spec.numel(L, E)
            return np.arange(n).reshape(spec.shape(L, E))
        # empty state: zeros
        return np.zeros(spec.shape(L, E))

    print(f"writing {out_path} ...", file=sys.stderr)
    write_bin_streaming(out_path, L, E, get)
    print("done", file=sys.stderr)


def _pick_file_gui() -> str | None:
    """GUI file picker fallback when no path is given on the command line
    (parity with the reference converter's tkinter fallback,
    converter/convert_model.py:220-248). Returns None if tkinter or a
    display is unavailable."""
    try:
        import tkinter as tk
        from tkinter import filedialog
    except ImportError:
        return None
    try:
        root = tk.Tk()
    except tk.TclError:  # no $DISPLAY
        return None
    root.withdraw()
    path = filedialog.askopenfilename(
        title="Select RWKV-v4 checkpoint",
        filetypes=[("PyTorch checkpoint", "*.pth"),
                   ("safetensors checkpoint", "*.safetensors"),
                   ("All files", "*")],
    )
    root.destroy()
    return path or None


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert RWKV-v4 .pth/.safetensors to quantized .bin")
    p.add_argument("pth", nargs="?", default=None,
                   help="input .pth or .safetensors checkpoint (BlinkDL or "
                        "HF-transformers naming; omit to pick via GUI dialog)")
    p.add_argument("-o", "--out", default="model.bin", help="output path")
    p.add_argument("--quant", choices=["q8", "q4"], default="q8",
                   help="q8: reference-format Q8_0 .bin (default). "
                        "q4: packed 4-bit .safetensors artifact "
                        "(io/q4fmt.py) — quantize once, then "
                        "RWKV(quant='q4').load_file() restarts without "
                        "touching the dense source")
    args = p.parse_args(argv)
    if args.pth is None:
        args.pth = _pick_file_gui()
        if args.pth is None:
            p.error("no input checkpoint given and no GUI available")
    if args.quant == "q4":
        from rwkv_tpu.io.q4fmt import save_q4

        if args.out == "model.bin":      # untouched default: fix the suffix
            args.out = "model.q4.safetensors"
        if not args.out.endswith(".safetensors"):
            p.error("--quant q4 writes a .safetensors artifact; "
                    f"give -o a .safetensors path (got {args.out})")
        save_q4(args.out, load_checkpoint_quantized(args.pth, bits=4))
        print(f"wrote packed q4 artifact {args.out}")
        return
    convert(args.pth, args.out)


if __name__ == "__main__":
    main()
