"""Packed-q4 checkpoint artifact (io/q4fmt.py): quantize once, restart
fast. Beyond-reference scope — the reference has one artifact (Q8_0 .bin)
for its one quant scheme; q4 serving previously re-quantized from the
dense source at every start."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.io.q4fmt import FORMAT_TAG, is_q4_file, load_q4, save_q4
from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_step,
    init_params,
    init_state,
    quantize_params,
    quantize_params_q4,
)


@pytest.fixture(scope="module")
def q4_params():
    cfg = RWKVConfig(n_layer=2, n_embd=32)
    return cfg, quantize_params_q4(
        init_params(jax.random.PRNGKey(9), cfg), tile=16)


def test_roundtrip_bitexact(q4_params, tmp_path):
    cfg, params = q4_params
    path = str(tmp_path / "m.q4.safetensors")
    save_q4(path, params)
    rt = load_q4(path)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(rt),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      jax.tree_util.keystr(ka))
    # packing metadata (the per-family split-half block) survives
    assert rt.att.output.block == params.att.output.block == 16
    assert rt.att.key.block is None
    # and the forward consumes it identically
    st = init_state(cfg)
    l0, _ = forward_step(params, jnp.asarray(5), st)
    l1, _ = forward_step(rt, jnp.asarray(5), st)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-6, atol=1e-6)


def test_is_q4_file_discriminates(q4_params, tmp_path):
    cfg, params = q4_params
    q4p = str(tmp_path / "m.q4.safetensors")
    save_q4(q4p, params)
    assert is_q4_file(q4p)
    # a DENSE safetensors is not a q4 artifact
    from rwkv_tpu.io.safetensors import write_safetensors

    dense = str(tmp_path / "d.safetensors")
    write_safetensors(dense, {"emb.weight": np.zeros((4, 4), np.float32)})
    assert not is_q4_file(dense)
    assert not is_q4_file(str(tmp_path / "missing.safetensors"))
    assert not is_q4_file("model.bin")


def test_save_q4_rejects_q8(tmp_path):
    cfg = RWKVConfig(n_layer=2, n_embd=16)
    q8 = quantize_params(init_params(jax.random.PRNGKey(1), cfg))
    with pytest.raises(TypeError, match="4-bit"):
        save_q4(str(tmp_path / "x.safetensors"), q8)


def test_load_q4_rejects_dense(tmp_path):
    from rwkv_tpu.io.safetensors import write_safetensors

    dense = str(tmp_path / "d.safetensors")
    write_safetensors(dense, {"a": np.zeros((2, 2), np.float32)})
    with pytest.raises(ValueError, match="not a rwkv-tpu-q4"):
        load_q4(dense)


def test_engine_autoloads_q4_artifact(q4_params, tmp_path):
    """RWKV().load_file on a tagged artifact switches to q4 and generates —
    no dense source, no requantize (the restart path)."""
    from rwkv_tpu.runtime.engine import RWKV

    cfg, params = q4_params
    path = str(tmp_path / "m.q4.safetensors")
    save_q4(path, params)

    eng = RWKV()                       # default q8 engine: auto-detects
    eng.load_file(path)
    assert eng.quant == "q4"
    eng.load_tokenizer()
    out = eng.generate("The", max_tokens=5, temp=0.0)
    assert isinstance(out, str)

    # parity with the in-memory q4 engine
    ref = RWKV(quant="q4")
    ref.load_params(params)
    ref.load_tokenizer()
    assert ref.generate("The", max_tokens=5, temp=0.0) == out


def test_convert_cli_q4(q4_params, tmp_path, monkeypatch, capsys):
    """rwkv-tpu-convert --quant q4 writes an artifact the engine loads."""
    from rwkv_tpu.io import convert as convert_mod
    from rwkv_tpu.io.safetensors import write_safetensors

    cfg = RWKVConfig(n_layer=2, n_embd=16)
    dense = init_params(jax.random.PRNGKey(3), cfg)
    # write the dense model as a BlinkDL-named safetensors source
    from rwkv_tpu.io.convert import _FAMILIES  # noqa: F401  (module import)
    sd = {}
    sd["emb.weight"] = np.asarray(dense.emb)
    sd["ln_out.weight"] = np.asarray(dense.ln_out.weight)
    sd["ln_out.bias"] = np.asarray(dense.ln_out.bias)
    sd["head.weight"] = np.asarray(dense.head).T.copy()
    sd["blocks.0.ln0.weight"] = np.asarray(dense.ln0.weight)
    sd["blocks.0.ln0.bias"] = np.asarray(dense.ln0.bias)
    for i in range(cfg.n_layer):
        p = f"blocks.{i}."
        sd[p + "ln1.weight"] = np.asarray(dense.ln1.weight[i])
        sd[p + "ln1.bias"] = np.asarray(dense.ln1.bias[i])
        sd[p + "ln2.weight"] = np.asarray(dense.ln2.weight[i])
        sd[p + "ln2.bias"] = np.asarray(dense.ln2.bias[i])
        sd[p + "att.time_mix_k"] = np.asarray(dense.att.mix_k[i])
        sd[p + "att.time_mix_v"] = np.asarray(dense.att.mix_v[i])
        sd[p + "att.time_mix_r"] = np.asarray(dense.att.mix_r[i])
        sd[p + "att.time_decay"] = np.log(-np.asarray(dense.att.decay[i]))
        sd[p + "att.time_first"] = np.asarray(dense.att.bonus[i])
        sd[p + "ffn.time_mix_k"] = np.asarray(dense.ffn.mix_k[i])
        sd[p + "ffn.time_mix_r"] = np.asarray(dense.ffn.mix_r[i])
        for fam, lin in (("att.key", dense.att.key),
                         ("att.value", dense.att.value),
                         ("att.receptance", dense.att.receptance),
                         ("att.output", dense.att.output),
                         ("ffn.key", dense.ffn.key),
                         ("ffn.value", dense.ffn.value),
                         ("ffn.receptance", dense.ffn.receptance)):
            sd[p + fam + ".weight"] = np.asarray(lin[i]).T.copy()
    src = str(tmp_path / "dense.safetensors")
    write_safetensors(src, sd)

    out = str(tmp_path / "m.q4.safetensors")
    convert_mod.main([src, "-o", out, "--quant", "q4"])
    assert is_q4_file(out)
    rt = load_q4(out)
    assert rt.n_layer == cfg.n_layer and rt.n_embd == cfg.n_embd
