"""Fetch the NeoX-20B tokenizer files (vocab.json + merges.txt) into ./vocab.

The vocab is a model artifact (50,277 entries) and is not vendored in this
repo. Sources, tried in order:
  1. an explicit path or URL argument,
  2. $RWKV_TPU_VOCAB,
  3. a local rwkv-cpp-accelerated checkout's tokenizer/vocab directory,
  4. the HF hub copy of the RWKV-4 tokenizer (requires network).

Usage: python tools/fetch_vocab.py [SOURCE] [-o DEST]
"""

import argparse
import os
import shutil
import sys
import urllib.request

FILES = ("vocab.json", "merges.txt")
DEFAULT_CANDIDATES = [
    os.environ.get("RWKV_TPU_VOCAB", ""),
    "/root/reference/include/rwkv/tokenizer/vocab",
]
HF_BASE = "https://huggingface.co/RWKV/rwkv-4-169m-pile/resolve/main"


def fetch(source: str | None, dest: str) -> bool:
    os.makedirs(dest, exist_ok=True)
    candidates = [source] if source else DEFAULT_CANDIDATES
    for cand in candidates:
        if not cand:
            continue
        if cand.startswith("http"):
            try:
                for f in FILES:
                    urllib.request.urlretrieve(f"{cand}/{f}", os.path.join(dest, f))
                return True
            except Exception as e:
                print(f"download from {cand} failed: {e}", file=sys.stderr)
                continue
        elif os.path.isdir(cand) and all(
            os.path.exists(os.path.join(cand, f)) for f in FILES
        ):
            for f in FILES:
                shutil.copy(os.path.join(cand, f), os.path.join(dest, f))
            return True
    # last resort: HF hub
    try:
        for f in FILES:
            urllib.request.urlretrieve(f"{HF_BASE}/{f}", os.path.join(dest, f))
        return True
    except Exception as e:
        print(f"HF download failed: {e}", file=sys.stderr)
    return False


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", nargs="?", help="dir or URL holding vocab files")
    p.add_argument("-o", "--out", default="vocab", help="destination dir")
    args = p.parse_args()
    if fetch(args.source, args.out):
        print(f"vocab ready in {args.out}/")
    else:
        print("could not locate vocab files; pass a source dir/URL", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
