"""ctypes bindings for the native C++ BPE tokenizer (native/tokenizer.cpp).

Same API surface as the pure-Python BPETokenizer; `load_best` picks the
native implementation when the shared library is available (build with
`make -C native`, or `python -m rwkv_tpu.tokenizer.native build`), else
falls back to Python. Encode is ~10-30x faster native — it matters for
server-side prompt ingest.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Iterable

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
SO_CANDIDATES = [
    os.environ.get("RWKV_TPU_TOK_SO", ""),
    os.path.join(_REPO, "native", "librwkv_tok.so"),
    os.path.join(_HERE, "librwkv_tok.so"),
]


def _find_so() -> str | None:
    for p in SO_CANDIDATES:
        if p and os.path.exists(p):
            return p
    return None


def build(verbose: bool = True) -> str | None:
    """Compile the native tokenizer in-tree. Returns the .so path or None."""
    src_dir = os.path.join(_REPO, "native")
    if not os.path.exists(os.path.join(src_dir, "tokenizer.cpp")):
        return None
    try:
        subprocess.run(
            ["make", "-C", src_dir, "librwkv_tok.so"],
            check=True,
            capture_output=not verbose,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native tokenizer build failed: {e}", file=sys.stderr)
        return None
    return _find_so()


class NativeBPETokenizer:
    """Drop-in for tokenizer.bpe.BPETokenizer backed by librwkv_tok.so."""

    def __init__(self, so_path: str, vocab_file: str, merges_file: str):
        lib = ctypes.CDLL(so_path)
        lib.rwkv_tok_load.restype = ctypes.c_void_p
        lib.rwkv_tok_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.rwkv_tok_vocab_size.restype = ctypes.c_int
        lib.rwkv_tok_vocab_size.argtypes = [ctypes.c_void_p]
        lib.rwkv_tok_encode.restype = ctypes.c_long
        lib.rwkv_tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ]
        lib.rwkv_tok_decode.restype = ctypes.c_long
        lib.rwkv_tok_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long,
        ]
        lib.rwkv_tok_free.restype = None
        lib.rwkv_tok_free.argtypes = [ctypes.c_void_p]

        self._lib = lib
        self._h = lib.rwkv_tok_load(vocab_file.encode(), merges_file.encode())
        if not self._h:
            raise RuntimeError(f"native tokenizer failed to load {vocab_file}")

    @classmethod
    def load(cls, vocab_dir: str | None = None) -> "NativeBPETokenizer":
        vocab_dir = vocab_dir or os.environ.get("RWKV_TPU_VOCAB")
        if not vocab_dir:
            from rwkv_tpu.tokenizer import assets

            if assets.available():
                # native loader needs the classic file pair on disk
                vocab_dir = assets.ensure_files()
            else:
                raise ValueError("no vocab dir and no bundled asset")
        so = _find_so() or build(verbose=False)
        if not so:
            raise RuntimeError("librwkv_tok.so not built (run make -C native)")
        return cls(
            so,
            os.path.join(vocab_dir, "vocab.json"),
            os.path.join(vocab_dir, "merges.txt"),
        )

    @property
    def vocab_size(self) -> int:
        return self._lib.rwkv_tok_vocab_size(self._h)

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        n = self._lib.rwkv_tok_encode(self._h, data, None, 0)
        if n <= 0:
            return []
        buf = (ctypes.c_int32 * n)()
        self._lib.rwkv_tok_encode(self._h, data, buf, n)
        return list(buf)

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        arr = list(ids)
        n = len(arr)
        if not n:
            return b""
        cbuf = (ctypes.c_int32 * n)(*arr)
        m = self._lib.rwkv_tok_decode(self._h, cbuf, n, None, 0)
        out = ctypes.create_string_buffer(max(m, 1))
        self._lib.rwkv_tok_decode(self._h, cbuf, n, out, m)
        return out.raw[:m]

    def decode(self, ids: Iterable[int]) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            try:
                self._lib.rwkv_tok_free(h)
            except Exception:
                pass
            self._h = None


def load_best(vocab_dir: str | None = None):
    """Native tokenizer when available, else the pure-Python one."""
    try:
        return NativeBPETokenizer.load(vocab_dir)
    except Exception:
        from rwkv_tpu.tokenizer.bpe import BPETokenizer

        return BPETokenizer.load(vocab_dir)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        path = build()
        print(path or "build failed")
        sys.exit(0 if path else 1)
