"""Engine q4 (4-bit) serving path: load/generate/guards.

The kernel itself is gated by tests/test_decode_stack.py's q4 parity
suite; these tests cover the serving surface — RWKV(quant='q4') ingest,
generation through the oracle step (CPU), and the loud failure modes
(.bin requant, sharding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import init_params, quantize_params_q4
from rwkv_tpu.ops.quant import Quant4Linear
from rwkv_tpu.runtime.engine import RWKV


@pytest.fixture(scope="module")
def q4_engine():
    eng = RWKV(quant="q4")
    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=64, vocab_size=300)
    eng.load_params(
        quantize_params_q4(init_params(jax.random.PRNGKey(3), cfg), tile=64))
    eng.load_tokenizer()
    return eng


def test_q4_engine_generates(q4_engine):
    out = q4_engine.generate("The", max_tokens=8, temp=0.0)
    assert isinstance(out, str)


def test_q4_engine_forward_shapes(q4_engine):
    logits = q4_engine.forward([1, 2, 3])
    assert logits.shape[-1] == q4_engine._true_vocab
    assert isinstance(q4_engine.params.att.key, Quant4Linear)


def test_q4_state_roundtrip(q4_engine):
    q4_engine.reset_state()
    q4_engine.forward([5, 9])
    snap = q4_engine.snapshot()
    a = q4_engine.forward([11])
    q4_engine.restore(snap)
    b = q4_engine.forward([11])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_arg_validated():
    with pytest.raises(ValueError, match="q8.*q4|q4.*q8"):
        RWKV(quant="int3")


def test_q4_bin_load_rejected(tmp_path):
    """Loading a Q8 .bin with quant='q4' must fail loudly (restacking
    4-bit on top of Q8 would double the quantization noise)."""
    from rwkv_tpu.io.binfmt import write_bin
    from rwkv_tpu.models.rwkv4 import quantize_params

    cfg = RWKVConfig.tiny_test(n_layer=1, n_embd=16, vocab_size=50277)
    params = quantize_params(
        init_params(jax.random.PRNGKey(0), cfg), as_numpy=True)
    p = str(tmp_path / "m.bin")
    write_bin(p, params)
    eng = RWKV(quant="q4")
    with pytest.raises(ValueError, match="dense source"):
        eng.load_file(p)


def test_q4_sharded_engine_generates():
    """Sharded q4 serving end-to-end: RWKV on a tp=2 mesh with 4-bit
    params decodes through the fused in-kernel-RDMA body (interpret mode
    on the CPU test mesh) and matches the single-chip q4 engine's greedy
    stream."""
    from rwkv_tpu.parallel.mesh import make_mesh
    from rwkv_tpu.parallel.sharding import ShardingContext

    cfg = RWKVConfig.tiny_test(n_layer=2, n_embd=256, vocab_size=300)
    params = quantize_params_q4(init_params(jax.random.PRNGKey(5), cfg),
                                tile=128)

    ref = RWKV(quant="q4")
    ref.load_params(params)
    ref.load_tokenizer()
    want = ref.generate("Hi", max_tokens=3, temp=0.0)

    eng = RWKV(sharding=ShardingContext(make_mesh(model=2, data=1)),
               quant="q4")
    eng.load_params(params)
    eng.load_tokenizer()
    got = eng.generate("Hi", max_tokens=3, temp=0.0)
    assert got == want


def test_q4_safetensors_ingest(tmp_path):
    """RWKV(quant='q4').load_file on a dense .safetensors: params land as
    Quant4Linear with the row-tiled block tag, logits track the dense
    model within 4-bit quant noise."""
    from tests.test_safetensors import _blinkdl_state_dict
    from rwkv_tpu.io.convert import load_checkpoint
    from rwkv_tpu.io.safetensors import write_safetensors
    from rwkv_tpu.models.rwkv4 import forward_seq, init_state

    w = _blinkdl_state_dict(n_layer=2, n_embd=16, vocab=512)
    p = str(tmp_path / "m.safetensors")
    write_safetensors(p, w)

    eng = RWKV(quant="q4")
    eng.load_file(p)
    assert isinstance(eng.params.att.key, Quant4Linear)
    assert eng.params.att.output.block == 16  # sub-lane model: tagged at E

    dense = load_checkpoint(p)
    toks = [5, 77, 300]
    lq = np.asarray(eng.forward(toks))[: dense.config.vocab_size]
    ld, _ = forward_seq(dense, jnp.asarray(toks), init_state(dense.config))
    ld = np.asarray(ld)
    assert np.corrcoef(lq.ravel(), ld.ravel())[0, 1] > 0.98
