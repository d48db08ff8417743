"""Torch-free .safetensors ingest (io/safetensors.py + convert dispatch).

Beyond-reference scope: the reference converter accepts only torch .pth
pickles (convert_model.py:24). Gates here:
  * reader round-trips the published format (F32/BF16/F16/I8), zero
    third-party deps
  * native-BlinkDL and HF-transformers (`RwkvForCausalLM`) key styles both
    convert, and the resulting .bin is BYTE-IDENTICAL to the .pth path
  * malformed files raise typed errors, not crashes
"""

import json

import numpy as np
import pytest

from rwkv_tpu.io.safetensors import (
    CheckpointView,
    SafetensorsFile,
    hf_key,
    is_hf_rwkv,
    open_checkpoint,
    write_safetensors,
)

pytestmark = []


def test_reader_roundtrip_dtypes(tmp_path):
    import ml_dtypes

    rng = np.random.default_rng(0)
    tensors = {
        "a_f32": rng.normal(size=(3, 5)).astype(np.float32),
        "b_f16": rng.normal(size=(4,)).astype(np.float16),
        "c_bf16": rng.normal(size=(2, 2)).astype(ml_dtypes.bfloat16),
        "d_i8": rng.integers(-100, 100, size=(7,)).astype(np.int8),
        "e_u8": rng.integers(0, 250, size=(2, 3)).astype(np.uint8),
    }
    p = str(tmp_path / "t.safetensors")
    write_safetensors(p, tensors, metadata={"format": "pt"})
    f = SafetensorsFile(p)
    assert f.metadata == {"format": "pt"}
    assert set(f) == set(tensors)
    np.testing.assert_array_equal(f["a_f32"], tensors["a_f32"])
    np.testing.assert_array_equal(f["b_f16"], tensors["b_f16"].astype(np.float32))
    np.testing.assert_array_equal(
        f["c_bf16"], np.asarray(tensors["c_bf16"], np.float32))
    np.testing.assert_array_equal(f["d_i8"], tensors["d_i8"])
    np.testing.assert_array_equal(f["e_u8"], tensors["e_u8"])
    assert f.dtype_of("c_bf16") == "BF16"
    f.close()


def test_reader_rejects_malformed(tmp_path):
    short = tmp_path / "short.safetensors"
    short.write_bytes(b"abc")
    with pytest.raises(ValueError, match="too short"):
        SafetensorsFile(str(short))

    badlen = tmp_path / "badlen.safetensors"
    badlen.write_bytes(np.uint64(10**15).tobytes() + b"{}")
    with pytest.raises(ValueError, match="header length"):
        SafetensorsFile(str(badlen))

    badjson = tmp_path / "badjson.safetensors"
    hdr = b"not json!!"
    badjson.write_bytes(np.uint64(len(hdr)).tobytes() + hdr)
    with pytest.raises(ValueError, match="header"):
        SafetensorsFile(str(badjson))

    # offsets escaping the data section
    ent = {"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 999]}}
    hdr = json.dumps(ent).encode()
    bad = tmp_path / "badoff.safetensors"
    bad.write_bytes(np.uint64(len(hdr)).tobytes() + hdr + b"\0" * 16)
    with pytest.raises(ValueError, match="outside"):
        SafetensorsFile(str(bad))


def _blinkdl_state_dict(n_layer=2, n_embd=16, vocab=50277, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.5):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    w = {"emb.weight": r(vocab, n_embd),
         "ln_out.weight": np.ones(n_embd, np.float32),
         "ln_out.bias": r(n_embd, scale=0.01),
         "head.weight": r(vocab, n_embd),
         "blocks.0.ln0.weight": np.ones(n_embd, np.float32),
         "blocks.0.ln0.bias": r(n_embd, scale=0.01)}
    for i in range(n_layer):
        p = f"blocks.{i}."
        w[p + "ln1.weight"] = np.ones(n_embd, np.float32)
        w[p + "ln1.bias"] = r(n_embd, scale=0.01)
        w[p + "ln2.weight"] = np.ones(n_embd, np.float32)
        w[p + "ln2.bias"] = r(n_embd, scale=0.01)
        for m in ("k", "v", "r"):
            w[p + f"att.time_mix_{m}"] = rng.random(
                (1, 1, n_embd)).astype(np.float32)
        w[p + "att.time_decay"] = r(n_embd, scale=0.3)
        w[p + "att.time_first"] = r(n_embd, scale=0.3)
        for m in ("key", "value", "receptance", "output"):
            w[p + f"att.{m}.weight"] = r(n_embd, n_embd, scale=n_embd ** -0.5)
        for m in ("k", "r"):
            w[p + f"ffn.time_mix_{m}"] = rng.random(
                (1, 1, n_embd)).astype(np.float32)
        w[p + "ffn.key.weight"] = r(4 * n_embd, n_embd, scale=n_embd ** -0.5)
        w[p + "ffn.value.weight"] = r(n_embd, 4 * n_embd,
                                      scale=(4 * n_embd) ** -0.5)
        w[p + "ffn.receptance.weight"] = r(n_embd, n_embd,
                                           scale=n_embd ** -0.5)
    return w


def test_checkpoint_view_native_and_hf(tmp_path):
    w = _blinkdl_state_dict()
    native = str(tmp_path / "native.safetensors")
    write_safetensors(native, w)
    v = open_checkpoint(native)
    assert not is_hf_rwkv(v._st)
    assert "emb.weight" in v
    np.testing.assert_array_equal(v["head.weight"], w["head.weight"])

    hf = {hf_key(k): a for k, a in w.items()}
    assert "rwkv.embeddings.weight" in hf
    hfp = str(tmp_path / "hf.safetensors")
    write_safetensors(hfp, hf)
    vh = open_checkpoint(hfp)
    assert is_hf_rwkv(vh._st)
    assert set(vh) == set(w)
    for k in ("emb.weight", "blocks.1.att.key.weight",
              "blocks.0.ffn.time_mix_r", "blocks.0.ln0.bias"):
        np.testing.assert_array_equal(vh[k], w[k])
    assert "not.a.key" not in vh


def test_convert_safetensors_byte_identical_to_pth(tmp_path):
    """The whole point: .safetensors input (either naming) produces the
    exact .bin bytes the torch .pth path produces."""
    torch = pytest.importorskip("torch")
    from rwkv_tpu.io.convert import convert

    w = _blinkdl_state_dict(n_layer=2, n_embd=16)
    pth = str(tmp_path / "m.pth")
    torch.save({k: torch.from_numpy(a.copy()) for k, a in w.items()}, pth)
    a = str(tmp_path / "from_pth.bin")
    convert(pth, a)

    native = str(tmp_path / "m.safetensors")
    write_safetensors(native, w)
    b = str(tmp_path / "from_st.bin")
    convert(native, b)

    hfp = str(tmp_path / "m_hf.safetensors")
    write_safetensors(hfp, {hf_key(k): v for k, v in w.items()})
    c = str(tmp_path / "from_hf.bin")
    convert(hfp, c)

    da = open(a, "rb").read()
    assert da == open(b, "rb").read(), "native safetensors .bin diverged"
    assert da == open(c, "rb").read(), "HF safetensors .bin diverged"


def test_load_checkpoint_safetensors_forward(tmp_path):
    """load_checkpoint on a bf16 HF-named safetensors: params load and a
    forward pass agrees with the float32 native path within bf16 noise."""
    import ml_dtypes
    import jax.numpy as jnp

    from rwkv_tpu.io.convert import load_checkpoint
    from rwkv_tpu.models.rwkv4 import forward_seq, init_state

    w = _blinkdl_state_dict(n_layer=2, n_embd=16)
    f32p = str(tmp_path / "f32.safetensors")
    write_safetensors(f32p, w)
    bf16p = str(tmp_path / "bf16.safetensors")
    write_safetensors(
        bf16p,
        {hf_key(k): np.asarray(a, ml_dtypes.bfloat16) for k, a in w.items()})

    pa = load_checkpoint(f32p)
    pb = load_checkpoint(bf16p)
    assert pa.config == pb.config
    toks = jnp.asarray([5, 77, 300])
    la, _ = forward_seq(pa, toks, init_state(pa.config))
    lb, _ = forward_seq(pb, toks, init_state(pb.config))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=0.35, rtol=0.05)  # bf16 weight noise


def test_engine_load_file_safetensors(tmp_path):
    """RWKV.load_file on a .safetensors checkpoint: same logits as loading
    the converted .bin (quantization is deterministic)."""
    import jax
    import numpy as np

    from rwkv_tpu.io.convert import convert
    from rwkv_tpu.runtime.engine import RWKV

    w = _blinkdl_state_dict(n_layer=2, n_embd=16)
    stp = str(tmp_path / "m.safetensors")
    write_safetensors(stp, w)
    binp = str(tmp_path / "m.bin")
    convert(stp, binp)

    ea = RWKV(); ea.load_file(stp)
    eb = RWKV(); eb.load_file(binp)
    toks = [11, 222, 3333]
    la = np.asarray(ea.forward(list(toks)))
    lb = np.asarray(eb.forward(list(toks)))
    np.testing.assert_allclose(la, lb, rtol=2e-5, atol=2e-5)


def test_load_checkpoint_quantized_matches_inmemory(tmp_path):
    """Streaming per-family quantized load == quantize_params(dense load)
    leaf-for-leaf (same pytree the engine's .bin path would build)."""
    import jax

    from rwkv_tpu.io.convert import load_checkpoint, load_checkpoint_quantized
    from rwkv_tpu.models.rwkv4 import quantize_params

    w = _blinkdl_state_dict(n_layer=3, n_embd=32)
    p = str(tmp_path / "m.safetensors")
    write_safetensors(p, w)
    a = load_checkpoint_quantized(p)
    b = quantize_params(load_checkpoint(p), as_numpy=True)
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_eval_cli_gate(tmp_path, capsys):
    """rwkv-tpu-eval: quant ppl + dense-vs-quant gate on a safetensors
    checkpoint; exit codes follow the gate."""
    import os

    from rwkv_tpu.eval.cli import main

    w = _blinkdl_state_dict(n_layer=2, n_embd=16)
    stp = str(tmp_path / "m.safetensors")
    write_safetensors(stp, w)
    txt = str(tmp_path / "eval.txt")
    with open(txt, "w") as f:
        f.write("The quick brown fox jumps over the lazy dog. " * 8)

    vocab = "/root/reference/include/rwkv/tokenizer/vocab"
    if not os.path.isdir(vocab):
        vocab = None
    args = ["--model", stp, "--text", txt, "--chunk", "32"]
    if vocab:
        args += ["--vocab", vocab]

    rc = main(args + ["--gate", "1e9"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["gate_passed"] is True
    assert out["tokens"] > 10 and out["quant_ppl"] > 0
    assert "dense_ppl" in out and "ppl_delta" in out

    rc = main(args + ["--gate=-1e9"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["gate_passed"] is False


def test_eval_cli_gate_bin_rejected_before_load(tmp_path, monkeypatch):
    """--gate with a .bin input is argv-decidable: reject BEFORE read_bin
    materializes a (potentially multi-GB) checkpoint."""
    import rwkv_tpu.io.binfmt as binfmt
    from rwkv_tpu.eval.cli import main

    def boom(*a, **k):
        raise AssertionError("read_bin must not run for --gate + .bin")

    monkeypatch.setattr(binfmt, "read_bin", boom)
    with pytest.raises(SystemExit) as e:
        main(["--model", str(tmp_path / "m.bin"), "--text",
              str(tmp_path / "missing.txt"), "--gate", "0.05"])
    assert e.value.code == 2
