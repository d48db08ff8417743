"""Host-RAM-during-load probe: the reference's headline "practically no
ram needed" claim (README.md:11, streaming disk->GPU at rwkv.cu:672-711),
measured for this framework's disk->HBM path.

Two phases, each in its own process so the numbers are clean:
  1. synth: write a synthetic .bin of the requested config with
     write_bin_streaming (peak RAM ~ one tensor; the file is zeros —
     RSS only cares about bytes moved, not their values).
  2. load: fresh process, `RWKV().load_file(path)` against the REAL TPU
     (tensors mmap'd one at a time and device_put straight to HBM),
     reporting ru_maxrss before and after the load. The delta is the
     host-RAM cost of loading the whole model.

Usage:  python tools/load_rss_probe.py [--model 1b5] [--bin PATH] [--keep]
        (TPU required for the honest number: on the CPU backend the
        "device" buffers ARE host RAM and the probe reports that too.)
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time


def synth(model: str, path: str) -> None:
    import numpy as np

    from rwkv_tpu.io.binfmt import write_bin_streaming
    from rwkv_tpu.models.config import RWKVConfig

    cfg = getattr(RWKVConfig, f"rwkv4_{model}")()

    def get(spec):
        # zeros are byte-realistic for RSS purposes; scales must be
        # positive so the loaded QuantLinear is well-formed
        a = np.zeros(spec.shape(cfg.n_layer, cfg.n_embd), dtype=spec.dtype)
        if spec.dtype == "f4" and spec.name.endswith("r"):  # quant scales
            a += 1.0 / 255.0
        return a

    t0 = time.time()
    write_bin_streaming(path, cfg.n_layer, cfg.n_embd, get)
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({"phase": "synth", "model": model,
                      "file_gb": round(os.path.getsize(path) / 2**30, 2),
                      "wall_s": round(time.time() - t0, 1),
                      "peak_rss_mb": round(peak_mb, 1)}))


def load(path: str, decode: int = 0) -> None:
    import jax  # noqa: F401  (platform from env — TPU by default here)

    from rwkv_tpu.runtime.engine import RWKV

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    eng = RWKV()
    eng.load_file(path)
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    out = {
        "phase": "load", "file_gb": round(os.path.getsize(path) / 2**30, 2),
        "device": str(jax.devices()[0].device_kind),
        "wall_s": round(wall, 1),
        "rss_before_load_mb": round(rss0, 1),
        "peak_rss_mb": round(rss1, 1),
        "load_delta_mb": round(rss1 - rss0, 1),
        "n_layer": eng.config.n_layer, "n_embd": eng.config.n_embd,
    }
    if decode:
        # the rest of the reference journey at real scale: tokenizer +
        # forward + typical sampling from the just-loaded engine
        # (rwkv.h:339-388 + typical.h + chat.cpp:75-88)
        eng.load_tokenizer()
        # warm with the SAME chunk (the decode program is per-chunk-size)
        eng.generate("The", max_tokens=8, chunk=8)
        t1 = time.time()
        text = eng.generate("The quick", max_tokens=decode, chunk=8)
        dt = time.time() - t1
        out.update({
            "decode_tokens": decode,
            "decode_tok_s": round(decode / dt, 2),
            "text_chars": len(text),
        })
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b5",
                    choices=["169m", "430m", "1b5", "3b", "7b", "14b"])
    ap.add_argument("--bin", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--phase", choices=["synth", "load"], default=None,
                    help="internal: run one phase in THIS process")
    ap.add_argument("--decode", type=int, default=0,
                    help="after load, generate N tokens (full journey)")
    args = ap.parse_args()
    path = args.bin or f"/tmp/rss_probe_{args.model}.bin"

    if args.phase == "synth":
        synth(args.model, path)
        return
    if args.phase == "load":
        load(path, decode=args.decode)
        return

    me = os.path.abspath(__file__)
    for phase in ("synth", "load"):
        if phase == "synth" and os.path.exists(path):
            print(f"# reusing {path}", file=sys.stderr)
            continue
        r = subprocess.run([sys.executable, me, "--model", args.model,
                            "--bin", path, "--phase", phase,
                            "--decode", str(args.decode)])
        if r.returncode != 0:
            sys.exit(r.returncode)
    if not args.keep:
        os.unlink(path)


if __name__ == "__main__":
    main()
