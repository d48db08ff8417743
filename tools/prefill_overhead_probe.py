"""Decompose the ~7% tp=1 sharded-prefill overhead (VERDICT round-3 #7).

Round-3 measured the sharded serving prefill (make_engine_prefill under
shard_map on a 1-device mesh) at 0.93x the plain forward_seq — but that
comparison conflates FOUR deltas, timed apart here in one session on the
real chip (slope method, same as bench.py):

  plain_T      forward_seq on [T] tokens, no length     (round-3 baseline)
  plain_rag    forward_seq on [T,1] + length vector      -> +batch+ragged
  tp_direct    make_tp_prefill, [T,1] tokens, length [1] -> +shard_map body
  tp_engine    make_engine_prefill on [T]                -> +adapter
               (round-3's 112.5k condition)

The gap plain_T -> plain_rag is the masked-scan/ragged machinery (which
serving needs regardless); plain_rag -> tp_direct is the shard_map entry +
size-1-collective cost (the recoverable part); tp_direct -> tp_engine is
the adapter's pad/squeeze (expected ~0 under jit).

Env: PROBE_T (512), PROBE_MODEL (430m), PROBE_PREC (bf16), PROBE_REPS (4).
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
from rwkv_tpu.parallel.mesh import make_mesh
from rwkv_tpu.parallel.tp_step import make_engine_prefill, make_tp_prefill


N_LO = int(os.environ.get("PROBE_CHUNKS_LO", "8"))
N_HI = int(os.environ.get("PROBE_CHUNKS_HI", "40"))


def slope_time(run_lo, run_hi, reps):
    """Best-of-reps slope between N_LO- and N_HI-chunk scans. The slope
    span (N_HI-N_LO chunks, >=150ms at 430M/T=512) must dwarf the ~30ms
    tunnel dispatch floor or variant ratios drown in noise (the round-4
    4-vs-8 version measured plain variants +/-25% run to run)."""
    np.asarray(run_lo())  # compile
    np.asarray(run_hi())
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(run_lo())
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(run_hi())
        b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - b1, 1e-9) / (N_HI - N_LO)  # seconds per chunk


def make_runner(seq_fn, params, toks, state):
    def ingest(params, toks, state, n_chunks):
        def body(st, _):
            logits, st = seq_fn(params, toks, st)
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
    prec = os.environ.get("PROBE_PREC", "bf16")
    reps = int(os.environ.get("PROBE_REPS", "4"))
    cdt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    cfg = getattr(RWKVConfig, f"rwkv4_{name}")()
    params = random_quantized_params_device(cfg, seed=0)
    sparams = signedize_params(params)
    toks = jnp.asarray(np.arange(T) % 50000, jnp.int32)
    toksB = toks[:, None]
    lenB = jnp.full((1,), T, jnp.int32)
    mesh = make_mesh(model=1, data=1)

    variants = {}

    # 1. plain [T], no length
    def plain_T(p, tk, st):
        return forward_seq(p, tk, st, parallel=True, compute_dtype=cdt)
    variants["plain_T"] = (plain_T, params, toks, init_state(cfg))

    # 1b. plain [T] + scalar length (mask machinery only, no batch dim)
    def plain_Tlen(p, tk, st):
        return forward_seq(p, tk, st, parallel=True,
                           length=jnp.asarray(T, jnp.int32),
                           compute_dtype=cdt)
    variants["plain_Tlen"] = (plain_Tlen, params, toks, init_state(cfg))

    # 1c. plain [T,1], no length (batch dim only, no mask)
    def plain_B(p, tk, st):
        return forward_seq(p, tk, st, parallel=True, compute_dtype=cdt)
    variants["plain_B"] = (plain_B, params, toksB, init_state(cfg, (1,)))

    # 2. plain [T,1] + ragged length vector
    def plain_rag(p, tk, st):
        return forward_seq(p, tk, st, parallel=True, length=lenB,
                           compute_dtype=cdt)
    variants["plain_rag"] = (plain_rag, params, toksB, init_state(cfg, (1,)))

    # 3. tp_prefill direct (shard_map body, no adapter)
    tp_sm = make_tp_prefill(mesh, sparams, compute_dtype=cdt, jit=False)

    def tp_direct(p, tk, st):
        return tp_sm(p, tk, st, lenB)
    variants["tp_direct"] = (tp_direct, sparams, toksB, init_state(cfg, (1,)))

    # 4. engine adapter on [T] (round-3's measured path)
    eng = make_engine_prefill(mesh, sparams, compute_dtype=cdt)

    def tp_engine(p, tk, st):
        return eng(p, tk, st, jnp.asarray(T, jnp.int32))
    variants["tp_engine"] = (tp_engine, sparams, toks, init_state(cfg))

    # 5. engine adapter, FULL-CHUNK fast path (length=None — what the
    # serving stack now dispatches for every exactly-full chunk)
    def tp_engine_full(p, tk, st):
        return eng(p, tk, st, None)
    variants["tp_engine_full"] = (tp_engine_full, sparams, toks,
                                  init_state(cfg))

    out = {"probe": "prefill_overhead", "model": name, "T": T, "prec": prec}
    base = None
    with jax.sharding.set_mesh(mesh):
        for vname, (fn, p, tk, st) in variants.items():
            r4, r8 = make_runner(fn, p, tk, st)
            per_chunk = slope_time(r4, r8, reps)
            tok_s = T / per_chunk
            out[vname] = round(tok_s, 1)
            if base is None:
                base = tok_s
            print(f"[{vname}] {tok_s:,.1f} tok/s ({tok_s/base:.3f}x)",
                  flush=True)
    out["ratios"] = {k: round(out[k] / out["plain_T"], 4)
                     for k in ("plain_T", "plain_Tlen", "plain_B",
                               "plain_rag", "tp_direct", "tp_engine",
                               "tp_engine_full")}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
