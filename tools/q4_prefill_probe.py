"""Q4 vs Q8 prefill throughput on the real chip — the one q4 surface
with no recorded number (decode/TP/serving are tabled in BENCH_NOTES
round-4; prefill over PACKED weights is functional-tested only).

Why it might differ: prefill's qmatmul fuses the u8->bf16 widening into
the MXU read loop (1 byte/weight HBM), while q4matmul must first
materialize the dense weight via unpack4 (VPU shifts/selects over every
element) before the dot — amortized over the chunk's T tokens, but the
unpack itself is O(weights) VPU work per chunk regardless of T. This
probe prices that against q8 at serving shapes.

Variants (forward_seq, parallel scan, bf16 compute, full-chunk unmasked):
  q8   — signed QuantLinear families       (the serving default)
  q4   — packed Quant4Linear families      (half the HBM bytes)

Env: PROBE_T (512), PROBE_MODEL (430m), PROBE_REPS (4),
PROBE_CHUNKS_LO/HI (8/40 — same slope discipline as
prefill_overhead_probe: the span must dwarf the ~30ms tunnel floor),
PROBE_Q4_MINK (sets ops.quant.set_q4_two_dot_min_k: 0 forces two_dot
everywhere, a huge value forces unpack — the A/B lever behind the
measured auto crossover), RWKV_TPU_Q4_TWO_DOT_IMPL (which two-dot impl
auto uses above the crossover: 'two_dot' or 'two_dot_i8' — the
int8-pinned nibble materialization; see q4matmul docstring).
"""

import functools as ft
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_seq,
    init_state,
    random_quantized_params_device,
    signedize_params,
)

N_LO = int(os.environ.get("PROBE_CHUNKS_LO", "8"))
N_HI = int(os.environ.get("PROBE_CHUNKS_HI", "40"))


def slope_time(run_lo, run_hi, reps):
    np.asarray(run_lo())  # compile
    np.asarray(run_hi())
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(run_lo())
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(run_hi())
        b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - b1, 1e-9) / (N_HI - N_LO)


def make_runner(params, toks, state):
    def ingest(params, toks, state, n_chunks):
        def body(st, _):
            logits, st = forward_seq(params, toks, st, parallel=True,
                                     compute_dtype=jnp.bfloat16)
            return st, logits[..., 0]
        st, lg = jax.lax.scan(body, state, None, length=n_chunks)
        return st, lg
    r_lo = jax.jit(ft.partial(ingest, n_chunks=N_LO))
    r_hi = jax.jit(ft.partial(ingest, n_chunks=N_HI))
    return (lambda: r_lo(params, toks, state)[1][-1],
            lambda: r_hi(params, toks, state)[1][-1])


def main():
    name = os.environ.get("PROBE_MODEL", "430m")
    T = int(os.environ.get("PROBE_T", "512"))
    reps = int(os.environ.get("PROBE_REPS", "4"))

    cfg = getattr(RWKVConfig, f"rwkv4_{name}")()
    toks = jnp.asarray(np.arange(T) % 50000, jnp.int32)

    out = {"probe": "q4_prefill", "model": name, "T": T}
    mink = os.environ.get("PROBE_Q4_MINK")
    if mink is not None:
        from rwkv_tpu.ops.quant import set_q4_two_dot_min_k

        set_q4_two_dot_min_k(int(mink))
        out["q4_min_k"] = int(mink)
    impl = os.environ.get("RWKV_TPU_Q4_TWO_DOT_IMPL")
    if impl is not None:
        out["q4_two_dot_impl"] = impl
    q8 = signedize_params(random_quantized_params_device(cfg, seed=0))
    r_lo, r_hi = make_runner(q8, toks, init_state(cfg))
    tok_q8 = T / slope_time(r_lo, r_hi, reps)
    out["q8"] = round(tok_q8, 1)
    print(f"[q8] {tok_q8:,.1f} tok/s", flush=True)
    del q8, r_lo, r_hi

    q4 = random_quantized_params_device(cfg, seed=0, q4=True)
    r_lo, r_hi = make_runner(q4, toks, init_state(cfg))
    tok_q4 = T / slope_time(r_lo, r_hi, reps)
    out["q4"] = round(tok_q4, 1)
    out["q4_vs_q8"] = round(tok_q4 / tok_q8, 3)
    print(f"[q4] {tok_q4:,.1f} tok/s ({out['q4_vs_q8']}x q8)", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
