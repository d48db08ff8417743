"""Native C++ tokenizer: parity vs the Python implementation + HF golden."""

import os
import subprocess

import pytest

VOCAB_DIR = "/root/reference/include/rwkv/tokenizer/vocab"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VOCAB_DIR), reason="reference vocab not available"
)


@pytest.fixture(scope="module")
def native():
    from rwkv_tpu.tokenizer.native import NativeBPETokenizer, build, _find_so

    if not _find_so():
        if not build(verbose=False):
            pytest.skip("native tokenizer build unavailable")
    return NativeBPETokenizer.load(VOCAB_DIR)


@pytest.fixture(scope="module")
def python_tok():
    from rwkv_tpu.tokenizer.bpe import BPETokenizer

    return BPETokenizer.load(VOCAB_DIR)


SAMPLES = [
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "  leading spaces and\ttabs\nnewlines\n\n",
    "don't can't won't it's I'll we've you're he'd",
    "1234567890 3.14159 0x1F",
    "naïve café résumé",
    "日本語のテキスト and 中文文本 and русский текст",
    "emoji 🎉🚀 test",
    "",
    " ",
    "\n\n\n",
    "x",
    "    indented code block\n        deeper",
    "mixed123alpha456beta",
    "UPPER lower MiXeD",
]


def test_vocab_size(native):
    assert native.vocab_size == 50277


@pytest.mark.parametrize("text", SAMPLES)
def test_encode_parity(native, python_tok, text):
    assert native.encode(text) == python_tok.encode(text), repr(text)


@pytest.mark.parametrize("text", SAMPLES)
def test_decode_roundtrip(native, text):
    assert native.decode(native.encode(text)) == text


def test_load_best_prefers_native():
    from rwkv_tpu.tokenizer.native import NativeBPETokenizer, load_best, _find_so

    tok = load_best(VOCAB_DIR)
    if _find_so():
        assert isinstance(tok, NativeBPETokenizer)
    assert tok.encode("hello")  # works either way


def test_binfmt_tool_roundtrip(tmp_path):
    """The native inspector validates a .bin we write from Python."""
    tool = os.path.join(REPO, "native", "binfmt_tool")
    if not os.path.exists(tool):
        pytest.skip("binfmt_tool not built")

    import jax

    from rwkv_tpu.io.binfmt import write_bin
    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import init_params, quantize_params

    cfg = RWKVConfig(n_layer=2, n_embd=16)
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    p = str(tmp_path / "m.bin")
    write_bin(p, params)

    out = subprocess.run([tool, "verify", p], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout

    info = subprocess.run([tool, "info", p], capture_output=True, text=True)
    assert "n_layer=2 n_embd=16" in info.stdout

    # corrupt the file -> verify must fail
    data = bytearray(open(p, "rb").read())
    data[:8] = (999999).to_bytes(8, "little")
    open(p, "wb").write(bytes(data))
    bad = subprocess.run([tool, "verify", p], capture_output=True, text=True)
    assert bad.returncode != 0
