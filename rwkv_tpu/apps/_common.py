"""Shared CLI plumbing for the example apps."""

from __future__ import annotations

import argparse
import os
import sys

from rwkv_tpu.runtime.engine import RWKV

DEFAULT_VOCAB = os.environ.get("RWKV_TPU_VOCAB")


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default=os.environ.get("MODEL_PATH"),
                   help="path to a .bin checkpoint (reference format)")
    p.add_argument("--vocab", default=DEFAULT_VOCAB,
                   help="dir with vocab.json + merges.txt ($RWKV_TPU_VOCAB)")
    p.add_argument("--mock", action="store_true",
                   help="tiny random-weights model (demo/tests, no checkpoint)")
    p.add_argument("--streams", type=int, default=1, help="max parallel streams")
    p.add_argument("--bf16-prefill", action="store_true",
                   help="bf16 matmuls for prompt ingest (~2x; see BENCH_NOTES)")
    p.add_argument("--temp", type=float, default=0.9)
    p.add_argument("--tau", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)


def build_engine(args) -> RWKV:
    import jax.numpy as jnp

    pdt = jnp.bfloat16 if getattr(args, "bf16_prefill", False) else jnp.float32
    eng = RWKV(max_streams=args.streams, prefill_dtype=pdt)
    if args.mock:
        import jax

        from rwkv_tpu.models.config import RWKVConfig
        from rwkv_tpu.models.rwkv4 import init_params, quantize_params

        cfg = RWKVConfig(n_layer=2, n_embd=64)
        eng.load_params(quantize_params(init_params(jax.random.PRNGKey(0), cfg)))
        print("[mock] tiny random model (output is gibberish by design)",
              file=sys.stderr)
    elif args.model:
        print(f"loading {args.model} ...", file=sys.stderr)
        eng.load_file(args.model, args.streams)
    else:
        print("error: need --model PATH or --mock", file=sys.stderr)
        sys.exit(2)

    if args.vocab:
        eng.load_tokenizer(args.vocab)
    else:
        print("error: need --vocab DIR (or $RWKV_TPU_VOCAB)", file=sys.stderr)
        sys.exit(2)
    return eng
