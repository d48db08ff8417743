"""Golden tokenizer tests against the REAL 50,277-entry RWKV "20B" vocab.

tests/fixtures/golden_tokens.json records text -> token ids produced by the
canonical implementation (HuggingFace's Rust GPT2TokenizerFast over the
same vocab/merges the reference ships in
include/rwkv/tokenizer/vocab/; fixtures built by
tools/make_vocab_assets.py). Both the pure-Python BPE and the native C++
tokenizer must reproduce every case — this is what proves the
pre-tokenizer regex classes (incl. the native cp_is_letter/cp_is_number
tables) on real multilingual text, which synthetic-vocab tests cannot.
"""

import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_tokens.json")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pytok():
    from rwkv_tpu.tokenizer.bpe import BPETokenizer

    return BPETokenizer.load()  # bundled asset


@pytest.fixture(scope="module")
def nativetok():
    from rwkv_tpu.tokenizer.native import NativeBPETokenizer, _find_so, build

    if not (_find_so() or build(verbose=False)):
        pytest.skip("native tokenizer not buildable here")
    return NativeBPETokenizer.load()  # bundled asset via ensure_files


def test_bundle_loads_full_vocab(pytok):
    assert pytok.vocab_size == 50277
    assert pytok.encoder["<|endoftext|>"] == 0
    assert pytok.encoder["<|padding|>"] == 1


def test_bundle_provenance_matches_reference():
    """When the reference checkout is present, the bundle must be the SAME
    artifact it ships (sha256 of vocab.json/merges.txt recorded at build)."""
    import hashlib

    with open(FIXTURE, encoding="utf-8") as f:
        fx = json.load(f)
    ref = "/root/reference/include/rwkv/tokenizer/vocab"
    if not os.path.isfile(os.path.join(ref, "vocab.json")):
        pytest.skip("reference checkout unavailable")
    for name, key in (("vocab.json", "vocab_sha256"),
                      ("merges.txt", "merges_sha256")):
        h = hashlib.sha256(
            open(os.path.join(ref, name), "rb").read()).hexdigest()
        assert h == fx[key], name


def test_python_bpe_matches_golden(pytok, golden):
    bad = []
    for case in golden["cases"]:
        ids = pytok.encode(case["text"])
        if ids != case["ids"]:
            bad.append((case["text"][:40], ids[:10], case["ids"][:10]))
    assert not bad, f"{len(bad)} golden mismatches, first: {bad[:3]}"


def test_python_bpe_decodes_golden(pytok, golden):
    for case in golden["cases"]:
        assert pytok.decode(case["ids"]) == case["decoded"], case["text"][:40]


def test_stream_decoder_golden(pytok, golden):
    """Token-at-a-time streaming decode must reassemble the same text."""
    from rwkv_tpu.tokenizer.bpe import StreamDecoder

    for case in golden["cases"][:30]:
        dec = StreamDecoder(pytok)
        out = "".join(dec.feed([i]) for i in case["ids"]) + dec.flush()
        assert out == case["decoded"], case["text"][:40]


def test_native_matches_golden(nativetok, golden):
    bad = []
    for case in golden["cases"]:
        ids = nativetok.encode(case["text"])
        if ids != case["ids"]:
            bad.append((case["text"][:40], ids[:10], case["ids"][:10]))
    assert not bad, f"{len(bad)} native golden mismatches, first: {bad[:3]}"


def test_native_decode_golden(nativetok, golden):
    for case in golden["cases"]:
        assert nativetok.decode(case["ids"]) == case["decoded"], (
            case["text"][:40])


def test_native_python_fuzz_parity(nativetok, pytok):
    """Random UTF-8 soup beyond the recorded fixtures: native and Python
    must agree exactly (catches cp_is_letter/cp_is_number drift on
    codepoints the corpus missed)."""
    import random

    rng = random.Random(123)
    pools = [
        (0x20, 0x7E), (0xA0, 0x36F), (0x370, 0x5FF), (0x600, 0x7FF),
        (0x900, 0xE7F), (0x1E00, 0x218B), (0x2C00, 0x2DFF),
        (0x3040, 0x312F), (0x4E00, 0x51FF), (0xA000, 0xA48F),
        (0xAC00, 0xAFFF), (0xFB00, 0xFB4F), (0x10000, 0x1007F),
        (0x1F300, 0x1F9FF),
    ]
    for trial in range(60):
        ln = rng.randint(1, 80)
        chars = []
        for _ in range(ln):
            lo, hi = rng.choice(pools)
            cp = rng.randint(lo, hi)
            if 0xD800 <= cp <= 0xDFFF:
                cp = 0x20
            chars.append(chr(cp))
        text = "".join(chars)
        assert nativetok.encode(text) == pytok.encode(text), (trial, text[:40])


def test_engine_default_tokenizer_roundtrip():
    """Engine with no vocab argument uses the bundled artifact."""
    from rwkv_tpu.runtime.engine import RWKV

    eng = RWKV()
    eng.load_tokenizer(native=False)
    ids = eng.tokenizer.encode("Hello world!")
    assert ids == [12092, 1533, 2]
    assert eng.tokenizer.decode(ids) == "Hello world!"
