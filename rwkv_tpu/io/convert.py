"""Offline converter: RWKV-v4 .pth -> quantized checkpoint.

Equivalent of the reference's converter/convert_model.py, minus the libtorch
C++ serializer (io/binfmt.py writes the identical format in numpy). torch is
imported lazily and only used to deserialize the .pth on CPU.

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


def load_pth(path: str) -> RWKVParams:
    """Read a BlinkDL RWKV-v4 .pth into dense float32 RWKVParams."""
    import torch

    w = torch.load(path, map_location="cpu", weights_only=True)
    missing = [k for k in REQUIRED_KEYS if k not in w]
    if missing:
        raise ValueError(f"{path}: not an RWKV-v4 checkpoint; missing {missing}")

    n_embd = w["blocks.0.att.key.weight"].shape[1]
    n_layer = sum(1 for k in w if "blocks" in k and "ln1.bias" in k)
    vocab = w["emb.weight"].shape[0]
    cfg = RWKVConfig(n_layer=n_layer, n_embd=n_embd, vocab_size=vocab)

    def npf(t):
        return np.asarray(t.float().numpy(), dtype=np.float32)

    def stack(fmt, transform=npf):
        return np.stack([transform(w[fmt.format(i)]) for i in range(n_layer)])

    def stack_sq(fmt):
        return stack(fmt, lambda t: npf(t).reshape(-1))

    def tT(name):
        # torch's blocked transpose is ~10x numpy's naive strided copy on
        # this workload (the converter is single-core memory-bound)
        return w[name].float().t().contiguous().numpy()

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


def convert(pth_path: str, out_path: str) -> None:
    from rwkv_tpu.io.binfmt import write_bin

    print(f"loading {pth_path} ...", file=sys.stderr)
    dense = load_pth(pth_path)
    cfg = dense.config
    print(f"model: L={cfg.n_layer} E={cfg.n_embd} V={cfg.vocab_size}; quantizing ...",
          file=sys.stderr)
    qparams = quantize_params(dense, as_numpy=True)  # disk-to-disk: never touch a device
    print(f"writing {out_path} ...", file=sys.stderr)
    write_bin(out_path, qparams)
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
        title="Select RWKV-v4 .pth checkpoint",
        filetypes=[("PyTorch checkpoint", "*.pth"), ("All files", "*")],
    )
    root.destroy()
    return path or None


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert RWKV-v4 .pth to quantized .bin")
    p.add_argument("pth", nargs="?", default=None,
                   help="input .pth checkpoint (omit to pick via GUI dialog)")
    p.add_argument("-o", "--out", default="model.bin", help="output .bin path")
    args = p.parse_args(argv)
    if args.pth is None:
        args.pth = _pick_file_gui()
        if args.pth is None:
            p.error("no input .pth given and no GUI available")
    convert(args.pth, args.out)


if __name__ == "__main__":
    main()
