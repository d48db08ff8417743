"""Guards for bench.py internals — the driver runs bench.py at the end of
every round; a silent breakage there loses the round's headline metric."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def _load_bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_weight_bytes_per_token_accounting():
    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import random_quantized_params_np

    bench = _load_bench()
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=128, vocab_size=256)
    params = random_quantized_params_np(cfg, pad_multiple=128)
    bpt = bench.weight_bytes_per_token(params)
    total = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(params))
    # equals the full pytree minus all-but-one emb row
    assert bpt == total - (params.emb.shape[0] - 1) * params.emb.shape[1] * 4
    E, L, F, Vp = 128, 2, 512, 256
    floor = L * (5 * E * E + 2 * E * F) + E * Vp  # quantized matrices alone
    assert bpt > floor


def test_pretiled_fabrication_matches_bench_expectations():
    """random_quantized_params_device(pretile=t) produces the 4-D layout
    decode_stack expects, and weight_bytes_per_token is layout-invariant."""
    jax.config.update("jax_platforms", "cpu")
    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import random_quantized_params_device

    bench = _load_bench()
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=128, vocab_size=256)
    flat = random_quantized_params_device(cfg, pad_multiple=128)
    tiled = random_quantized_params_device(cfg, pad_multiple=128, pretile=128)
    assert tiled.att.key.w.ndim == 4
    assert tiled.att.key.w.shape == (2, 1, 128, 128)
    assert bench.weight_bytes_per_token(flat) == \
        bench.weight_bytes_per_token(tiled)


def test_chip_lock_acquire_and_bypass(tmp_path, monkeypatch):
    """_acquire_chip_lock serializes TPU processes on a flock: free lock
    -> acquired fd; RWKV_TPU_CHIP_LOCK=0 (a runbook wrapper already holds
    it) -> None without touching the file; held lock + expired wait ->
    proceeds anyway (the headline bench must never fail on a stale lock)."""
    import fcntl
    import os

    bench = _load_bench()
    path = str(tmp_path / "tpu.lock")

    monkeypatch.setenv("RWKV_TPU_CHIP_LOCK", "0")
    assert bench._acquire_chip_lock(path=path) is None
    assert not os.path.exists(path)

    monkeypatch.setenv("RWKV_TPU_CHIP_LOCK", "1")
    fd = bench._acquire_chip_lock(path=path, wait_s=0)
    assert fd is not None
    # flock is per open-file-description: a second open of the same path
    # in this process contends, so the expired-wait fallthrough engages.
    fd2 = bench._acquire_chip_lock(path=path, wait_s=0)
    assert fd2 is not None and fd2 != fd
    with __import__("pytest").raises(OSError):
        fcntl.flock(fd2, fcntl.LOCK_EX | fcntl.LOCK_NB)  # fd still holds it
    os.close(fd)
    fcntl.flock(fd2, fcntl.LOCK_EX | fcntl.LOCK_NB)  # now free
    os.close(fd2)
