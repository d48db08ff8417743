"""Bundled RWKV "20B" (GPT-NeoX-20B) tokenizer vocabulary.

The vocabulary is a MODEL ARTIFACT (EleutherAI's NeoX tokenizer: 50,277
entries + 50,008 merges) which the reference ships in-tree
(include/rwkv/tokenizer/vocab/). This package bundles the same artifact as
one gzipped JSON bundle (rwkv20b.json.gz, ~550KB, built by
tools/make_vocab_assets.py) so the tokenizer works out of the box —
`BPETokenizer.load()` with no arguments.

Two consumers:
  * load_bundle() — in-memory (vocab dict, merges list) for the Python BPE.
  * ensure_files() — materializes vocab.json + merges.txt into a cache dir
    for consumers that need the classic file pair (the native C++
    tokenizer's loader, external tools).
"""

from __future__ import annotations

import gzip
import json
import os

ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "rwkv20b.json.gz")


def available() -> bool:
    return os.path.isfile(ASSET)


def load_bundle() -> tuple[dict[str, int], list[tuple[str, str]]]:
    """(vocab, merges) from the bundled asset."""
    if not available():
        raise FileNotFoundError(
            f"bundled vocab missing ({ASSET}); rebuild with "
            "tools/make_vocab_assets.py or pass an explicit vocab dir"
        )
    with gzip.open(ASSET, "rb") as f:
        data = json.loads(f.read().decode("utf-8"))
    return data["vocab"], [tuple(m) for m in data["merges"]]


def ensure_files(cache_dir: str | None = None) -> str:
    """Materialize vocab.json + merges.txt from the bundle; returns the dir.

    Default cache: $XDG_CACHE_HOME/rwkv_tpu/vocab (or ~/.cache/...).
    Idempotent — skips the write when both files already exist."""
    if cache_dir is None:
        base = os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        )
        cache_dir = os.path.join(base, "rwkv_tpu", "vocab")
    vpath = os.path.join(cache_dir, "vocab.json")
    mpath = os.path.join(cache_dir, "merges.txt")
    if os.path.isfile(vpath) and os.path.isfile(mpath):
        return cache_dir
    vocab, merges = load_bundle()
    os.makedirs(cache_dir, exist_ok=True)
    # per-process temp names: two concurrent first-runs must not interleave
    # writes into a shared .tmp and install a corrupted cache
    import tempfile

    fd_v, tmp_v = tempfile.mkstemp(dir=cache_dir, suffix=".vocab.tmp")
    fd_m, tmp_m = tempfile.mkstemp(dir=cache_dir, suffix=".merges.tmp")
    try:
        # mkstemp creates 0600; the cache may be shared — restore the
        # conventional umask-style readability before install
        os.fchmod(fd_v, 0o644)
        os.fchmod(fd_m, 0o644)
        with os.fdopen(fd_v, "w", encoding="utf-8") as f:
            json.dump(vocab, f, ensure_ascii=False, indent=4)
        with os.fdopen(fd_m, "w", encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for a, b in merges:
                f.write(f"{a} {b}\n")
        os.replace(tmp_v, vpath)
        os.replace(tmp_m, mpath)
    finally:
        for t in (tmp_v, tmp_m):
            if os.path.exists(t):
                os.unlink(t)
    return cache_dir
