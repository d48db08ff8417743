"""rwkv_tpu — a TPU-native RWKV-v4 quantized inference framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``harrisonvanderbyl/rwkv-cpp-accelerated`` (the CUDA/HIP/Vulkan reference):
uint8 weight-only quantized RWKV-v4 inference, streaming checkpoint load,
native BPE tokenizer, typical sampling, state snapshot/branching, and — new
scope beyond the reference — tensor/data parallel serving over a
``jax.sharding.Mesh`` plus a 4-bit weight format (``quant='q4'``: half
the HBM bytes/token, 1.4-1.9x decode, 14B on one 16GB chip).

Layer map (bottom to top), mirroring the reference's architecture
(see /root/reference README and SURVEY.md) but TPU-first:

  ops/       pure-JAX + Pallas compute: u8 fused-dequant matmul, WKV scan,
             layernorm, token-shift, on-device samplers
  models/    RWKV-v4 as functional pytrees (stacked-layer params, lax.scan)
  parallel/  mesh construction + named shardings (TP over 'model', DP over
             'data'), GSPMD-driven collectives over ICI
  io/        reference-compatible .bin checkpoint read/write, .pth converter,
             streaming disk->HBM loader
  tokenizer/ GPT-2 style byte-level BPE (NeoX 20B vocab, 50277 entries)
  runtime/   the engine (loadFile/forward/loadContext API parity) and the
             continuous-batching state pool
  apps/      storygen, chat, HTTP server, vectordb examples
"""

from rwkv_tpu.version import __version__

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    RWKVParams,
    WKVState,
    init_state,
    forward_seq,
    forward_step,
)

__all__ = [
    "__version__",
    "RWKVConfig",
    "RWKVParams",
    "WKVState",
    "init_state",
    "forward_seq",
    "forward_step",
]
