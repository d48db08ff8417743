"""Converter: synthetic .pth -> params -> .bin pipeline."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from rwkv_tpu.io.convert import load_pth, convert  # noqa: E402
from rwkv_tpu.io.binfmt import read_bin  # noqa: E402
from rwkv_tpu.models.rwkv4 import forward_seq, init_state, quantize_params  # noqa: E402
from rwkv_tpu.ops.quant import dequantize  # noqa: E402


def make_synthetic_pth(path, n_layer=2, n_embd=16, vocab=50277):
    g = torch.Generator().manual_seed(0)

    def r(*shape, scale=0.5):
        return torch.randn(*shape, generator=g) * scale

    w = {"emb.weight": r(vocab, n_embd),
         "ln_out.weight": torch.ones(n_embd), "ln_out.bias": r(n_embd, scale=0.01),
         "head.weight": r(vocab, n_embd),
         "blocks.0.ln0.weight": torch.ones(n_embd), "blocks.0.ln0.bias": r(n_embd, scale=0.01)}
    for i in range(n_layer):
        p = f"blocks.{i}."
        w[p + "ln1.weight"] = torch.ones(n_embd)
        w[p + "ln1.bias"] = r(n_embd, scale=0.01)
        w[p + "ln2.weight"] = torch.ones(n_embd)
        w[p + "ln2.bias"] = r(n_embd, scale=0.01)
        for m in ("k", "v", "r"):
            w[p + f"att.time_mix_{m}"] = torch.rand(1, 1, n_embd, generator=g)
        w[p + "att.time_decay"] = r(n_embd, scale=0.3)
        w[p + "att.time_first"] = r(n_embd, scale=0.3)
        for m in ("key", "value", "receptance", "output"):
            w[p + f"att.{m}.weight"] = r(n_embd, n_embd, scale=n_embd ** -0.5)
        for m in ("k", "r"):
            w[p + f"ffn.time_mix_{m}"] = torch.rand(1, 1, n_embd, generator=g)
        w[p + "ffn.key.weight"] = r(4 * n_embd, n_embd, scale=n_embd ** -0.5)
        w[p + "ffn.value.weight"] = r(n_embd, 4 * n_embd, scale=(4 * n_embd) ** -0.5)
        w[p + "ffn.receptance.weight"] = r(n_embd, n_embd, scale=n_embd ** -0.5)
    torch.save(w, path)
    return w


def test_load_pth_semantics(tmp_path):
    path = str(tmp_path / "tiny.pth")
    w = make_synthetic_pth(path)
    params = load_pth(path)

    assert params.config.n_layer == 2
    assert params.config.n_embd == 16

    # decay = -exp(time_decay)
    expected = -np.exp(w["blocks.1.att.time_decay"].numpy())
    np.testing.assert_allclose(np.asarray(params.att.decay[1]), expected, rtol=1e-6)

    # weights transposed to [in, out]
    np.testing.assert_allclose(
        np.asarray(params.att.key[0]),
        w["blocks.0.att.key.weight"].numpy().T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params.head), w["head.weight"].numpy().T, rtol=1e-6
    )

    # mixes squeezed from [1,1,E]
    np.testing.assert_allclose(
        np.asarray(params.ffn.mix_r[0]),
        w["blocks.0.ffn.time_mix_r"].numpy().reshape(-1),
        rtol=1e-6,
    )


def test_full_convert_pipeline(tmp_path):
    """pth -> convert() -> .bin -> read_bin -> forward: quantized output close
    to dense-from-pth output."""
    pth = str(tmp_path / "tiny.pth")
    binp = str(tmp_path / "tiny.bin")
    make_synthetic_pth(pth)
    convert(pth, binp)

    dense = load_pth(pth)
    loaded = read_bin(binp)

    tokens = jnp.asarray([10, 250, 3000])
    state = init_state(dense.config)
    l_dense, _ = forward_seq(dense, tokens, state)
    l_loaded, _ = forward_seq(loaded, tokens, state)

    # and the loaded u8 payload must be bit-identical to quantizing in-memory
    q = quantize_params(dense)
    np.testing.assert_array_equal(np.asarray(loaded.att.key.w), np.asarray(q.att.key.w))
    np.testing.assert_allclose(
        np.asarray(l_loaded), np.asarray(l_dense), atol=0.6
    )  # u8 noise bound on random logits
    # distribution-level agreement
    import jax
    tv = 0.5 * float(jnp.abs(jax.nn.softmax(l_loaded) - jax.nn.softmax(l_dense)).sum())
    assert tv < 0.15


def test_streaming_convert_bit_identical_to_inmemory(tmp_path):
    """The streaming converter's .bin is byte-identical to quantizing the
    fully-loaded checkpoint through write_bin."""
    from rwkv_tpu.io.binfmt import write_bin
    from rwkv_tpu.io.convert import convert, load_pth
    from rwkv_tpu.models.rwkv4 import quantize_params

    import numpy as np

    from rwkv_tpu.io.registry import file_layout

    pth = str(tmp_path / "model.pth")
    make_synthetic_pth(pth, n_layer=3, n_embd=32)
    a = str(tmp_path / "stream.bin")
    b = str(tmp_path / "mem.bin")
    convert(pth, a)
    write_bin(b, quantize_params(load_pth(pth), as_numpy=True))
    da = open(a, "rb").read()
    db = open(b, "rb").read()
    assert len(da) == len(db)
    for name, off, n in file_layout(3, 32):
        if name == "decay":
            # the streaming path keeps decay = -exp(time_decay) in full
            # float64 like the reference converter (convert_model.py:58);
            # the in-memory path rounds through RWKVParams' float32 field
            x = np.frombuffer(da[off:off + n], "<f8")
            y = np.frombuffer(db[off:off + n], "<f8")
            np.testing.assert_array_equal(
                x.astype(np.float32), y.astype(np.float32))
        else:
            assert da[off:off + n] == db[off:off + n], name


def test_byte_identical_to_reference_converter(tmp_path):
    """The ultimate converter parity proof: run the REFERENCE converter
    (its own code, JIT-compiled libtorch saver) on a synthetic .pth and
    byte-compare its .bin with ours. Every real tensor — quantized
    weights, scales, offsets, layernorms, mixes, decay/bonus, head — plus
    the scratch rows and the f32-round-tripped empty state must match
    exactly."""
    import os
    import shutil
    import subprocess
    import sys as _sys

    REF = "/root/reference/converter"
    if not os.path.isfile(os.path.join(REF, "convert_model.py")):
        pytest.skip("reference checkout unavailable")
    if shutil.which("ninja") is None and shutil.which("g++") is None:
        pytest.skip("no native toolchain for the reference's JIT saver")

    work = tmp_path / "refconv"
    (work / "conv").mkdir(parents=True)
    shutil.copy(os.path.join(REF, "convert_model.py"), work / "conv")
    shutil.copy(os.path.join(REF, "cpp_save_tensor.cpp"), work / "conv")
    # the saver's extra_include_paths expects ../include relative to itself
    os.symlink("/root/reference/include", work / "include")

    pth = str(work / "toy.pth")
    make_synthetic_pth(pth, n_layer=2, n_embd=16)

    r = subprocess.run(
        [_sys.executable, "convert_model.py", "../toy.pth"],
        cwd=work / "conv", capture_output=True, text=True, timeout=540,
    )
    ref_bin = work / "conv" / "model.bin"
    if r.returncode != 0 or not ref_bin.is_file():
        pytest.skip(f"reference converter did not run here: {r.stderr[-300:]}")

    ours = str(work / "ours.bin")
    convert(pth, ours)
    a = ref_bin.read_bytes()
    b = open(ours, "rb").read()
    assert len(a) == len(b)
    assert a == b, "converter output diverged from the reference's bytes"
