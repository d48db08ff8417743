"""Decode-throughput benchmark. Prints ONE JSON line.

Primary metric (BASELINE.md): single-stream greedy decode tokens/sec on a
u8-quantized RWKV-4 model on one TPU chip. The reference publishes no
numbers ("published": {} in BASELINE.json), so vs_baseline is reported
against the only principled yardstick: the HBM speed-of-light for this
workload (weight bytes per token / chip HBM bandwidth) — i.e. the fraction
of theoretical peak decode rate achieved. 1.0 = memory-bound optimum.

Env knobs:
  RWKV_TPU_BENCH_MODEL  — config name (169m|430m|1b5|3b|7b|14b), default 430m
  RWKV_TPU_BENCH_STEPS  — decode steps per timed repetition (default 256)
  RWKV_TPU_BENCH_BIN    — optional path to a real .bin checkpoint
  RWKV_TPU_BENCH_IMPL   — 'fused' (Pallas decode-stack kernel, default),
                          'fused_q4' (same kernel on 4-bit nibble-packed
                          weights: half the HBM bytes/token — the
                          beyond-reference format, ops/pallas/mm4.py),
                          'fused_a8' (native s8xs8 MXU, no widening pass;
                          adds activation-quant noise),
                          'xla' (plain jnp forward_step),
                          'tp' (the sharded serving step on a 1-device
                          mesh: shard_map + per-shard Pallas half-kernels
                          — the tp=1 sanity number for multi-chip decode;
                          the gap to 'fused' is the per-layer kernel-split
                          + collective-schedule overhead), or
                          'tpfused' (same 1-device shard_map but the
                          whole-stack in-kernel-collective kernel,
                          decode_stack_tp — should recover ~the 'fused'
                          rate, proving the TP path keeps single-chip
                          kernel efficiency), or
                          'tpfused_q4' (the TP kernel on 4-bit packed
                          weights — the sharded q4 serving body at tp=1)
  RWKV_TPU_BENCH_BATCH  — number of independent decode streams (default 1);
                          >1 reports aggregate tokens/s (continuous batching)
  RWKV_TPU_BENCH_TILE   — fused kernel tile (default auto)
  RWKV_TPU_BENCH_MODE   — 'decode' (default) or 'prefill' (parallel-scan
                          prompt ingest throughput, T=512 chunks)
  RWKV_TPU_CHIP_LOCK    — '0' skips the chip flock (a runbook wrapper
                          already holds runbook_out/tpu.lock); default '1'
                          serializes on it so two TPU processes never
                          contend on the tunnel
  RWKV_TPU_CHIP_LOCK_WAIT_S — max seconds to wait for the chip lock
                          before proceeding anyway with a warning
                          (default 2700 — past the longest runbook probe)
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the fused decode kernel inside a long scan takes
# minutes to compile; cache makes reruns instant. One shared implementation
# with the serving stack (utils/cache.py — the engine enables it too).
from rwkv_tpu.utils.cache import configure_cache  # noqa: E402

configure_cache()


def _acquire_chip_lock(path=None, wait_s=None):
    """Serialize on the one real chip with the queued-measurement runbook
    (tools/tpu_runbook.sh holds the same flock): two concurrent TPU
    processes contend on the tunnel and corrupt each other's timing
    (CLAUDE.md). Blocks up to RWKV_TPU_CHIP_LOCK_WAIT_S (default 2700 —
    past the runbook's longest single probe), then proceeds with a
    stderr warning rather than failing the headline bench. The fd is
    held for the process lifetime; flock releases on exit/crash."""
    import fcntl
    import sys

    if os.environ.get("RWKV_TPU_CHIP_LOCK", "1") == "0":
        return None  # caller already holds it (tools/tpu_runbook.sh)
    wait_s = int(os.environ.get("RWKV_TPU_CHIP_LOCK_WAIT_S", "2700")
                 if wait_s is None else wait_s)
    if path is None:
        # anchor to the repo, NOT the cwd: the runbooks lock the repo's
        # runbook_out/tpu.lock, and a bench launched from elsewhere must
        # contend on the SAME file or the chip mutual exclusion is void.
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "runbook_out", "tpu.lock")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd = os.open(path, os.O_CREAT | os.O_RDWR)
    deadline = time.time() + wait_s
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fd
        except OSError:
            if time.time() >= deadline:
                print(f"[bench] chip lock still held after {wait_s}s — "
                      "proceeding anyway (timings may contend)",
                      file=sys.stderr, flush=True)
                return fd
            time.sleep(10)


def weight_bytes_per_token(params) -> int:
    """Bytes that must stream from HBM for one decode step: every quantized
    matrix + scales/offsets + layernorms/mixes/decay/bonus + one emb row."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    # emb is gathered one row at a time, not fully streamed
    total -= params.emb.size * params.emb.dtype.itemsize
    total += params.emb.shape[1] * params.emb.dtype.itemsize
    return total


def bench_prefill(cfg, params, name, T=None, reps=4):
    """Prompt-ingest throughput: parallel-WKV chunked prefill.

    RWKV_TPU_BENCH_PREC=bf16 runs the matmuls in bf16 (f32 accumulate):
    prefill is MXU-compute-bound, so bf16's 4x rate advantage shows here
    (decode does not care — it is HBM-bound).

    RWKV_TPU_BENCH_IMPL=tp/tpfused routes through the sharded serving
    prefill (parallel.tp_step.make_engine_prefill under shard_map on a
    1-device mesh) — the path the pool/engine use when sharded; the gap
    to the plain forward_seq number is the shard_map execution overhead
    at tp=1 (collectives are absent)."""
    import numpy as np

    from rwkv_tpu.models.rwkv4 import forward_seq, init_state

    impl = os.environ.get("RWKV_TPU_BENCH_IMPL", "fused")
    prec = os.environ.get("RWKV_TPU_BENCH_PREC", "f32")
    cdt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    if T is None:
        T = int(os.environ.get("RWKV_TPU_BENCH_PREFILL_T", "512"))
    state = init_state(cfg)
    toks = jnp.asarray(np.arange(T) % 50000, jnp.int32)

    seq_fn = None
    if impl in ("tp", "tpfused"):
        from rwkv_tpu.models.rwkv4 import signedize_params
        from rwkv_tpu.parallel.mesh import make_mesh
        from rwkv_tpu.parallel.tp_step import make_engine_prefill

        params = signedize_params(params)
        mesh = make_mesh(model=1, data=1)
        tp_prefill = make_engine_prefill(mesh, params, compute_dtype=cdt)

        def seq_fn(params, toks, st):
            return tp_prefill(params, toks, st,
                              jnp.asarray(toks.shape[0], jnp.int32))

    def ingest(params, toks, state, n_chunks):
        def body(st, _):
            if seq_fn is not None:
                logits, st = seq_fn(params, toks, st)
            else:
                logits, st = forward_seq(params, toks, st, parallel=True,
                                         compute_dtype=cdt)
            return st, logits[..., 0]
        st, lg = jax.lax.scan(body, state, None, length=n_chunks)
        return st, lg

    import functools as ft
    import numpy as np

    r1 = jax.jit(ft.partial(ingest, n_chunks=4))
    r2 = jax.jit(ft.partial(ingest, n_chunks=8))
    np.asarray(r1(params, toks, state)[1][-1])
    np.asarray(r2(params, toks, state)[1][-1])
    import time as tt
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = tt.perf_counter(); np.asarray(r1(params, toks, state)[1][-1])
        b1 = min(b1, tt.perf_counter() - t0)
        t0 = tt.perf_counter(); np.asarray(r2(params, toks, state)[1][-1])
        b2 = min(b2, tt.perf_counter() - t0)
    per_chunk = max(b2 - b1, 1e-9) / 4
    tok_s = T / per_chunk
    print(json.dumps({
        "metric": f"prefill_tokens_per_sec_rwkv4_{name}_q8"
                  + ("_bf16" if prec == "bf16" else "")
                  + (f"_{impl}" if impl in ("tp", "tpfused") else ""),
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": 1.0,
        "extras": {"chunk": T, "ms_per_chunk": round(per_chunk * 1e3, 2),
                   "prec": prec,
                   "n_layer": cfg.n_layer, "n_embd": cfg.n_embd},
    }))


def main():
    _acquire_chip_lock()
    name = os.environ.get("RWKV_TPU_BENCH_MODEL", "430m")
    steps = int(os.environ.get("RWKV_TPU_BENCH_STEPS", "128"))
    batch = int(os.environ.get("RWKV_TPU_BENCH_BATCH", "1"))
    bin_path = os.environ.get("RWKV_TPU_BENCH_BIN")
    impl = os.environ.get("RWKV_TPU_BENCH_IMPL", "fused")
    mode_env = os.environ.get("RWKV_TPU_BENCH_MODE", "decode")
    tile_env = os.environ.get("RWKV_TPU_BENCH_TILE")
    tile = int(tile_env) if tile_env else None

    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import (
        forward_step,
        init_state,
        random_quantized_params_device,
    )

    if bin_path:
        from rwkv_tpu.io.binfmt import read_bin, read_header

        # Host-side contiguous-block re-layout at read time for the fused
        # decode bench: an on-device pretile_params would transiently hold
        # BOTH layouts of each big family (~4GB extra at 14B) and OOM the
        # 16GB chip — same gate as runtime/engine.load_file.
        ptile = None
        if impl in ("fused", "fused_a8") and mode_env != "prefill":
            hdr = read_header(bin_path)
            if hdr.n_embd % 256 == 0 and hdr.n_ffn % 256 == 0:
                from rwkv_tpu.ops.pallas.decode_stack import pick_tile

                ptile = tile if tile else pick_tile(hdr.n_embd)
        params = read_bin(bin_path, pad_vocab_to=512, pretile=ptile)
        cfg = params.config
    else:
        cfg = getattr(RWKVConfig, f"rwkv4_{name}")()
        # on-device fabrication: no multi-GB host->device transfer;
        # fabricate directly in the kernel's contiguous-block layout when
        # benching the fused kernel (avoids a transient 2x-family copy)
        ptile = None
        if impl == "fused_q4" and mode_env != "prefill":
            from rwkv_tpu.ops.pallas.decode_stack import pick_tile_q4

            ptile = tile if tile else pick_tile_q4(cfg.n_embd)
        elif impl == "tpfused_q4":
            # the TP kernel validates block == tile, so the fabrication
            # block must be the TP pick regardless of pretile
            from rwkv_tpu.ops.pallas.decode_stack_tp import (
                pick_tp_fused_tile)

            bp = max(8, -(-batch // 8) * 8)
            q4t = tile if tile else pick_tp_fused_tile(
                cfg.n_embd, cfg.n_embd, 1, bp=bp, q4=True)
            env = os.environ.get("RWKV_TPU_BENCH_PRETILE")
            want = (env not in ("", "0")) if env is not None else batch >= 8
            ptile = q4t if want else None
            q4_fab_tile = q4t
        elif impl in ("fused", "fused_a8") and mode_env != "prefill":
            from rwkv_tpu.ops.pallas.decode_stack import pick_tile

            ptile = tile if tile else pick_tile(cfg.n_embd)
        # impl=tpfused layout policy (round 3, BENCH_NOTES): at matched
        # tile the layouts are within noise at B=1; at batch the 4-D
        # contiguous-block layout is +6%/+4% (B=8/16) and the only
        # VMEM-safe tile=512 at B=32 (+27% over the best 3-D option) —
        # so pretile by default at batch >= 8, matching the engine's
        # sharded policy.
        # RWKV_TPU_BENCH_PRETILE=0/1 overrides either way.
        if impl == "tpfused":
            env = os.environ.get("RWKV_TPU_BENCH_PRETILE")
            want = (env not in ("", "0")) if env is not None else batch >= 8
            if want:
                from rwkv_tpu.ops.pallas.decode_stack_tp import (
                    pick_tp_fused_tile)

                bp = max(8, -(-batch // 8) * 8)
                ptile = tile if tile else pick_tp_fused_tile(
                    cfg.n_embd, cfg.n_embd, 1, bp=bp)
        q4i = impl in ("fused_q4", "tpfused_q4")
        params = random_quantized_params_device(
            cfg, seed=0, pretile=ptile, q4=q4i,
            q4_tile=(q4_fab_tile if impl == "tpfused_q4" else ptile))

    state = init_state(cfg, (batch,)) if batch > 1 else init_state(cfg)

    mode = os.environ.get("RWKV_TPU_BENCH_MODE", "decode")
    if mode == "prefill":
        bench_prefill(cfg, params, name)
        return

    if impl in ("fused", "fused_a8", "fused_q4"):
        import functools

        from rwkv_tpu.models.rwkv4 import signedize_params
        from rwkv_tpu.ops.pallas.decode_stack import (forward_step_fused,
                                                      pretile_params)

        params = signedize_params(params)  # q4 leaves pass through untouched
        k = params.att.key
        if (k.wp if hasattr(k, "wp") else k.w).ndim != 4:
            params = pretile_params(params, tile=tile)  # .bin: not pretiled
        ht_env = os.environ.get("RWKV_TPU_BENCH_HEAD_TILE")
        step_fn = functools.partial(forward_step_fused, tile=tile,
                                    head_tile=int(ht_env) if ht_env else None,
                                    a8=(impl == "fused_a8"))
    elif impl in ("tp", "tpfused", "tpfused_q4"):
        from rwkv_tpu.models.rwkv4 import signedize_params
        from rwkv_tpu.parallel.mesh import make_mesh
        from rwkv_tpu.parallel.tp_step import make_engine_step

        params = signedize_params(params)
        mesh = make_mesh(model=1, data=1)
        step_fn = make_engine_step(
            mesh, params,
            body=("pallas" if impl == "tp" else "fused"),
            tile=(params.att.output.block if impl == "tpfused_q4"
                  else tile))
    else:
        step_fn = forward_step

    # K greedy decode steps fully on device: the sampled token feeds back
    # inside one jit (no host round-trips, like a real serving inner loop).
    def make_decoder(n_steps):
        def decode_k(params, token, state):
            def body(carry, _):
                tok, st = carry
                logits, st = step_fn(params, tok, st)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, st), nxt

            (tok, state), toks = jax.lax.scan(
                body, (token, state), None, length=n_steps
            )
            return tok, state, toks
        return decode_k

    run = jax.jit(make_decoder(steps))
    if batch > 1:
        tok = jnp.full((batch,), 187, jnp.int32)
    else:
        tok = jnp.asarray(187, jnp.int32)

    # warmup + compile. NOTE: sync via host readback — on the tunneled
    # 'axon' platform block_until_ready() returns before execution finishes,
    # so np.asarray of an output scalar is the only trustworthy barrier.
    import numpy as np

    t0 = time.perf_counter()
    tok2, state2, toks = run(params, tok, state)
    np.asarray(tok2)
    compile_s = time.perf_counter() - t0

    # Two-length slope timing: the tunneled device adds a fixed ~30ms
    # dispatch+sync floor per call; timing K and 2K steps and taking the
    # difference measures pure per-token device time.
    run2 = jax.jit(make_decoder(2 * steps))
    tok3, _, _ = run2(params, tok, state)
    np.asarray(tok3)

    reps = 5
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        tok2, state2, toks = run(params, tok, state)
        np.asarray(tok2)
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        tok3, _, toks2 = run2(params, tok, state)
        np.asarray(tok3)
        b2 = min(b2, time.perf_counter() - t0)

    per_step = max(b2 - b1, 1e-9) / steps
    tok_s = batch / per_step
    lat_ms = per_step * 1e3

    # speed-of-light: weight traffic / HBM bandwidth
    dev = jax.devices()[0]
    hbm_gbs = {
        "TPU v4": 1228.0, "TPU v5 lite": 819.0, "TPU v5": 819.0,
        "TPU v5p": 2765.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0,
    }
    bw = next((v for k, v in hbm_gbs.items() if k in dev.device_kind), 819.0)
    bpt = weight_bytes_per_token(params)
    sol_tok_s = bw * 1e9 / bpt

    qtag = "q4" if impl in ("fused_q4", "tpfused_q4") else "q8"
    itag = {"fused_q4": "fused", "tpfused_q4": "tpfused"}.get(impl, impl)
    print(json.dumps({
        "metric": f"decode_tokens_per_sec_rwkv4_{name}_{qtag}_{itag}"
                  + (f"_b{batch}" if batch > 1 else ""),
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / sol_tok_s, 4),
        "extras": {
            "p50_token_latency_ms": round(lat_ms, 3),
            "speed_of_light_tokens_per_sec": round(sol_tok_s, 1),
            "weight_bytes_per_token": bpt,
            "device": dev.device_kind,
            "assumed_hbm_GBps": bw,
            "compile_s": round(compile_s, 1),
            "n_layer": cfg.n_layer, "n_embd": cfg.n_embd, "batch": batch,
        },
    }))


if __name__ == "__main__":
    main()
