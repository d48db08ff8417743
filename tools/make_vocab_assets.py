"""Build the bundled tokenizer vocabulary asset + golden token fixtures.

The RWKV-v4 "20B" tokenizer is the GPT-NeoX-20B byte-level BPE (50,277
entries). It is a MODEL ARTIFACT (EleutherAI's NeoX tokenizer), which the
reference ships in-tree (include/rwkv/tokenizer/vocab/vocab.json +
merges.txt, loaded by tokenizer.h:57-103). For parity this repo bundles
the same artifact, re-serialized as one gzipped JSON bundle
(rwkv_tpu/tokenizer/assets/rwkv20b.json.gz) consumed by
rwkv_tpu.tokenizer.assets.

Golden fixtures: tests/fixtures/golden_tokens.json records text -> token-id
pairs produced by the CANONICAL implementation (HuggingFace's Rust fast
tokenizer, GPT2TokenizerFast over the same vocab/merges — the exact
pre-tokenize regex family the vocab was trained with). Both the Python BPE
(tokenizer/bpe.py) and the native C++ tokenizer (native/tokenizer.cpp) are
gated on these in tests/test_tokenizer_golden.py; any divergence in the
regex classes (e.g. cp_is_letter approximations) on covered codepoints
fails the suite.

Usage:
    python tools/make_vocab_assets.py [--source DIR]

--source: a directory containing vocab.json + merges.txt (default: the
reference checkout's shipped copy, then $RWKV_TPU_VOCAB).
"""

from __future__ import annotations

import argparse
import gzip
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SOURCES = (
    "/root/reference/include/rwkv/tokenizer/vocab",
    os.environ.get("RWKV_TPU_VOCAB", ""),
)
ASSET = os.path.join(REPO, "rwkv_tpu", "tokenizer", "assets", "rwkv20b.json.gz")
FIXTURE = os.path.join(REPO, "tests", "fixtures", "golden_tokens.json")

# Corpus stressing everything the pre-tokenizer regex and byte-level BPE
# must get right: \p{L}/\p{N} unicode classes (incl. non-ASCII digits and
# number-like codepoints), contractions (ASCII and U+2019), whitespace runs
# and the \s+(?!\S) lookahead, CJK/Cyrillic/Greek/Arabic/Hebrew/Indic/Thai
# scripts, combining marks, emoji (+ZWJ sequences), control chars, and
# mixed-script words.
CORPUS = [
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "don't can't won't I'll you're we've she'd it's",
    "don’t ‘quoted’ “double”",
    "   leading and trailing   ",
    "tabs\tand\nnewlines\r\nand\x0bvertical",
    "a  b   c    d     e",
    "word, punctuation; and: some? marks! (parens) [brackets] {braces}",
    "numbers 0 1 42 12345 3.14159 -17 1e10 0x1F",
    "mixed123alpha456numeric",
    "٠١٢ arabic-indic ০১ bengali ०१ devanagari digits",
    "superscript ¹²³ fraction ½¾ roman ⅠⅡⅢ",
    "café naïve résumé über straße",
    "čeština příliš žluťoučký kůň",
    "日本語のテキストです。",
    "中文文本测试。简体和繁體。",
    "한국어 텍스트 한글",
    "Привет, мир! Русский текст.",
    "Ελληνικά κείμενο",
    "العربية نص",
    "עברית טקסט",
    "हिन्दी पाठ",
    "ไทย ข้อความ",
    "emoji \U0001f680\U0001f525 done \U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 family",
    "flags \U0001f1fa\U0001f1f8\U0001f1ef\U0001f1f5 and ❤️ heart",
    "combining áé ö ñ vs precomposed áé ö ñ",
    "zero​width and nbsp space",
    "mixedScript日本語latinрус",
    "URL https://example.com/path?q=1&x=2#frag and email a.b@c-d.org",
    "code: def f(x): return x**2  # comment",
    "The year 2023 CE; 年号 令和5年",
    "Q: What is 2+2?\nA: 4.\n\nQ: Why?\n\nA: Because.",
    "<|endoftext|> literal and <|padding|> literal",
    "¡Hola! ¿Cómo estás?",
    "Tiếng Việt với dấu thanh",
    "Türkçe metin ığüşöç",
    "rock'n'roll o'clock 'tis 'twas",
    "hyphen-ated co-operate re‐hyphen — em—dash – en–dash",
    "math ∑∏√∞ ≠≤≥ ±×÷",
    "currency $100 €50 £42 ¥7000 ₹100 ₿1",
    "",
    " ",
    "\n",
    "a",
    "\U0001f600",
]


def _find_source(arg: str | None) -> str:
    cands = [arg] if arg else [d for d in DEFAULT_SOURCES if d]
    for d in cands:
        if d and os.path.isfile(os.path.join(d, "vocab.json")):
            return d
    sys.exit(
        "no vocab source found; pass --source DIR with vocab.json+merges.txt"
    )


def _random_utf8_cases(n: int = 40, seed: int = 7) -> list[str]:
    """Seeded random codepoint soup — broad-coverage fuzz fixtures."""
    import random

    rng = random.Random(seed)
    pools = [
        (0x20, 0x7E), (0xA0, 0x2FF), (0x370, 0x4FF), (0x590, 0x6FF),
        (0x900, 0x97F), (0xE00, 0xE7F), (0x1E00, 0x1EFF), (0x2000, 0x206F),
        (0x20A0, 0x20BF), (0x2150, 0x218B), (0x3040, 0x30FF),
        (0x4E00, 0x4FFF), (0xAC00, 0xACFF), (0x1F300, 0x1F64F),
    ]
    out = []
    for _ in range(n):
        ln = rng.randint(1, 60)
        chars = []
        for _ in range(ln):
            lo, hi = rng.choice(pools)
            cp = rng.randint(lo, hi)
            if 0xD800 <= cp <= 0xDFFF:
                cp = 0x20
            chars.append(chr(cp))
        out.append("".join(chars))
    return out


def _block_sweep_cases() -> list[str]:
    """Systematic \\p{L}/\\p{N} sweep: one probe string per 256-codepoint
    window (block granularity) that contains an assigned letter or digit,
    over the full Unicode range. Each probe exercises the pre-tokenizer's
    class boundaries at that window: a letter run, a mixed ASCII+letter
    word (run continuation), a digit run and an ASCII+digit run — so the
    native tokenizer's hand-rolled cp_is_letter/cp_is_digit tables
    (native/tokenizer.cpp) are gated per block, not per 14 fuzz pools.

    Skips codepoints HF's Rust Unicode tables may version-skew on is NOT
    done — the canonical ids are the parity target; any divergence is a
    bug in our class tables."""
    import unicodedata

    cases = []
    for base in range(0x0, 0x110000, 0x100):
        letters, digits = [], []
        for cp in range(base, min(base + 0x100, 0x110000)):
            if 0xD800 <= cp <= 0xDFFF:
                continue
            cat = unicodedata.category(chr(cp))
            if cat.startswith("L") and len(letters) < 3:
                letters.append(chr(cp))
            elif cat.startswith("N") and len(digits) < 2:
                digits.append(chr(cp))
            if len(letters) == 3 and len(digits) == 2:
                break
        if not letters and not digits:
            continue
        parts = []
        if letters:
            parts.append("".join(letters))          # pure letter run
            parts.append("ab" + letters[0])         # ASCII-letter continuation
        if digits:
            parts.append("".join(digits))           # pure digit run
            parts.append("12" + digits[0])          # ASCII-digit continuation
        if letters and digits:
            parts.append(letters[0] + digits[0])    # class boundary L|N
        cases.append(" ".join(parts))
    return cases


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default=None)
    args = ap.parse_args()
    src = _find_source(args.source)
    vpath = os.path.join(src, "vocab.json")
    mpath = os.path.join(src, "merges.txt")

    with open(vpath, encoding="utf-8") as f:
        vocab = json.load(f)
    merges: list[list[str]] = []
    with open(mpath, encoding="utf-8") as f:
        next(f)  # version header
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            a, sep, b = line.partition(" ")
            if sep:
                merges.append([a, b])
    assert len(vocab) == 50277, len(vocab)

    os.makedirs(os.path.dirname(ASSET), exist_ok=True)
    bundle = json.dumps({"vocab": vocab, "merges": merges},
                        ensure_ascii=False, separators=(",", ":"))
    with open(ASSET, "wb") as raw:
        # mtime=0 keeps the asset byte-reproducible across rebuilds
        with gzip.GzipFile(fileobj=raw, mode="wb", compresslevel=9,
                           mtime=0) as f:
            f.write(bundle.encode("utf-8"))
    print(f"wrote {ASSET} ({os.path.getsize(ASSET)} bytes, "
          f"{len(vocab)} tokens, {len(merges)} merges)")

    # golden fixtures from the canonical (HF Rust) implementation
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    from transformers import GPT2TokenizerFast

    canon = GPT2TokenizerFast(vocab_file=vpath, merges_file=mpath)
    cases = []
    for text in CORPUS + _random_utf8_cases() + _block_sweep_cases():
        # split_special_tokens=True: encode magic strings like
        # "<|endoftext|>" as plain text — the reference tokenizer
        # (tokenizer.h) is pure regex+BPE with no special-token detection,
        # and that is the parity target
        ids = canon(text, split_special_tokens=True)["input_ids"]
        back = canon.decode(ids)
        cases.append({"text": text, "ids": ids, "decoded": back})

    fixture = {
        "source": "GPT-NeoX-20B tokenizer (RWKV '20B' vocab), canonical ids "
                  "from HuggingFace GPT2TokenizerFast (Rust)",
        "vocab_sha256": hashlib.sha256(
            open(vpath, "rb").read()).hexdigest(),
        "merges_sha256": hashlib.sha256(
            open(mpath, "rb").read()).hexdigest(),
        "cases": cases,
    }
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w", encoding="utf-8") as f:
        json.dump(fixture, f, ensure_ascii=False, indent=1)
    print(f"wrote {FIXTURE} ({len(cases)} cases)")


if __name__ == "__main__":
    main()
