"""Tokenizer golden tests against the NeoX-20B vocab shipped with the
reference checkout (used read-only as test fixture data)."""

import os

import pytest

from rwkv_tpu.tokenizer.bpe import BPETokenizer, StreamDecoder, bytes_to_unicode

VOCAB_DIR = "/root/reference/include/rwkv/tokenizer/vocab"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VOCAB_DIR), reason="reference vocab not available"
)


@pytest.fixture(scope="module")
def tok():
    return BPETokenizer.load(VOCAB_DIR)


def test_vocab_size(tok):
    assert tok.vocab_size == 50277


def test_byte_unicode_table_roundtrip():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    assert table[ord("A")] == "A"
    assert table[32] == "Ġ"  # space -> Ġ


SAMPLES = [
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "  leading spaces and\ttabs\nnewlines\n\n",
    "don't can't won't it's I'll we've you're he'd",
    "1234567890 3.14159 0x1F",
    "naïve café résumé — em–dash … ellipsis",
    "日本語のテキスト and 中文文本 and русский текст",
    "emoji 🎉🚀 and zalgo h̸̢̪̯ȩ̷̺l̷̙̃l̶̡̮ō̶",
    "",
    " ",
    "\n",
    "<|endoftext|>",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_roundtrip(tok, text):
    assert tok.decode(tok.encode(text)) == text


def test_golden_against_hf(tok):
    """Cross-check encodings against the independent HF fast tokenizer built
    from the same files (skipped if transformers unavailable)."""
    try:
        from transformers import GPT2TokenizerFast
    except Exception:
        pytest.skip("transformers not importable")
    hf = GPT2TokenizerFast(
        vocab_file=os.path.join(VOCAB_DIR, "vocab.json"),
        merges_file=os.path.join(VOCAB_DIR, "merges.txt"),
    )
    for text in SAMPLES:
        if text == "<|endoftext|>":
            # HF registers it as a special token; the reference tokenizer (and
            # ours) encodes the literal text (tokenizer.h has no specials).
            continue
        assert tok.encode(text) == hf.encode(text), text


def test_known_token(tok):
    # '<|endoftext|>' is id 0 in the NeoX vocab
    assert tok.encoder.get("<|endoftext|>") == 0


def test_stream_decoder_partial_utf8(tok):
    text = "héllo 🎉 wörld"
    ids = tok.encode(text)
    sd = StreamDecoder(tok)
    out = "".join(sd.feed([i]) for i in ids) + sd.flush()
    assert out == text


def test_tokenize_pieces_roundtrip(tok):
    """tokenize() pieces join back to the byte-unicode form and map to the
    same ids encode() gives (reference GPT2Tokenizer::tokenize parity)."""
    text = "Hello world, it's 2026!"
    pieces = tok.tokenize(text)
    assert all(isinstance(p, str) and p for p in pieces)
    assert [tok.encoder[p] for p in pieces] == tok.encode(text)
