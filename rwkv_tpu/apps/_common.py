"""Shared CLI plumbing for the example apps."""

from __future__ import annotations

import argparse
import os
import sys

from rwkv_tpu.runtime.engine import RWKV

DEFAULT_VOCAB = os.environ.get("RWKV_TPU_VOCAB")


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default=os.environ.get("MODEL_PATH"),
                   help="path to a .bin checkpoint (reference format) or a "
                        ".safetensors/.pth RWKV-v4 checkpoint (quantized "
                        "on load)")
    p.add_argument("--quant", choices=("q8", "q4"), default="q8",
                   help="weight format: q8 (reference Q8_0 parity) or q4 "
                        "(4-bit nibble-packed — half the HBM bytes/token, "
                        "1.4-1.9x decode, 14B in ~7GB; needs a dense "
                        ".safetensors/.pth source; with --shards it runs "
                        "the fused in-kernel-RDMA TP body)")
    p.add_argument("--vocab", default=DEFAULT_VOCAB,
                   help="dir with vocab.json + merges.txt "
                        "(default: the bundled 50,277-entry vocab)")
    p.add_argument("--mock", action="store_true",
                   help="tiny random-weights model (demo/tests, no checkpoint)")
    p.add_argument("--streams", type=int, default=1, help="max parallel streams")
    p.add_argument("--shards", type=int, default=1, metavar="TP",
                   help="tensor-parallel width: shard the model over TP "
                        "devices (decode runs the minimal-collective "
                        "shard_map step; parallel/tp_step.py)")
    p.add_argument("--tp-body", choices=("xla", "pallas", "fused"),
                   default=None,
                   help="TP step body (default auto: fused per-shard "
                        "Pallas kernels when E/TP is lane-aligned)")
    p.add_argument("--tp-pretile", choices=("auto", "on", "off"),
                   default="auto",
                   help="sharded weight layout: contiguous-block pretile "
                        "(auto = on when --streams >= 8; BENCH_NOTES). The "
                        "server sizes the baked tile for max(--streams, "
                        "--pool) so pooled batches pass the VMEM pre-check")
    p.add_argument("--bf16-prefill", action="store_true",
                   help="bf16 matmuls for prompt ingest (~2x; see BENCH_NOTES)")
    p.add_argument("--platform", default=os.environ.get("RWKV_TPU_PLATFORM"),
                   help="force a jax platform (e.g. 'cpu'). Setting the "
                        "JAX_PLATFORMS env var does not stick once a TPU "
                        "plugin is on PYTHONPATH; this flag applies "
                        "jax.config.update('jax_platforms', ...) before the "
                        "first device op — for --mock demos and boxes "
                        "without the accelerator (env: RWKV_TPU_PLATFORM)")
    p.add_argument("--temp", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)


def build_engine(args) -> RWKV:
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    pdt = jnp.bfloat16 if getattr(args, "bf16_prefill", False) else jnp.float32
    sharding = None
    if getattr(args, "shards", 1) > 1:
        from rwkv_tpu.parallel.mesh import make_mesh
        from rwkv_tpu.parallel.sharding import ShardingContext

        sharding = ShardingContext(make_mesh(model=args.shards, data=1))
        print(f"[tp] sharding over {args.shards} devices", file=sys.stderr)
    elif getattr(args, "tp_body", None):
        print("warning: --tp-body has no effect without --shards > 1",
              file=sys.stderr)
    pt = {"auto": None, "on": True, "off": False}[
        getattr(args, "tp_pretile", "auto")]
    eng = RWKV(max_streams=args.streams, prefill_dtype=pdt,
               sharding=sharding, tp_body=getattr(args, "tp_body", None),
               tp_pretile=pt, quant=getattr(args, "quant", "q8"))
    if args.mock:
        import jax

        from rwkv_tpu.models.config import RWKVConfig
        from rwkv_tpu.models.rwkv4 import (init_params, quantize_params,
                                           quantize_params_q4)

        cfg = RWKVConfig(n_layer=2, n_embd=64)
        dense = init_params(jax.random.PRNGKey(0), cfg)
        if eng.quant == "q4":
            # tiny mock E is below any kernel tile; tag blocks at E
            eng.load_params(quantize_params_q4(dense, tile=cfg.n_embd))
        else:
            eng.load_params(quantize_params(dense))
        print("[mock] tiny random model (output is gibberish by design)",
              file=sys.stderr)
    elif args.model:
        print(f"loading {args.model} ...", file=sys.stderr)
        eng.load_file(args.model, args.streams)
    else:
        print("error: need --model PATH or --mock", file=sys.stderr)
        sys.exit(2)

    try:
        eng.load_tokenizer(args.vocab)  # None -> bundled 50,277-entry vocab
    except (ValueError, OSError) as e:  # OSError: missing/unreadable files
        print(f"error: no tokenizer vocab ({e}); pass --vocab DIR or set "
              f"$RWKV_TPU_VOCAB", file=sys.stderr)
        sys.exit(2)
    return eng
