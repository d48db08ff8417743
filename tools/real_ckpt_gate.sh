#!/usr/bin/env bash
# Real-checkpoint quality gate: the one-command .pth -> .bin -> verify ->
# decode -> perplexity journey (BASELINE.md: u8 ppl delta vs fp32 <= 0.05).
#
# The build environment has zero egress, so no real RWKV-4 checkpoint is
# reachable from CI; this script makes the whole gate executable the moment
# one is (download any RWKV-4 .pth — e.g. RWKV-4-Pile-169M — and run:
#
#   tools/real_ckpt_gate.sh /path/to/RWKV-4-Pile-169M.pth [eval.txt]
#
# Steps:
#   1. convert  — streaming .pth -> quantized .bin (rwkv_tpu.io.convert)
#   2. verify   — native binfmt_tool structural check (header, 46-tensor
#                 registry shapes, sizes)
#   3. decode   — load the .bin in the engine, tokenize a prompt with the
#                 bundled 50,277-entry vocab, generate text (greedy +
#                 sampled), print it for eyeball sanity
#   4. ppl gate — teacher-forced NLL of the u8 engine vs the fp32 reference
#                 path on the eval text; FAILS (exit 1) if delta > 0.05
#
# Pass RWKV_GATE_DEVICE=cpu to force CPU (default: whatever jax finds,
# i.e. the TPU when tunneled).
set -euo pipefail

PTH="${1:?usage: real_ckpt_gate.sh model.pth [eval.txt]}"
EVAL_TXT="${2:-}"
BIN="${PTH%.pth}.rwkv_tpu.bin"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

echo "== 1/4 convert: $PTH -> $BIN"
python -m rwkv_tpu.io.convert "$PTH" -o "$BIN"

echo "== 2/4 verify: native binfmt_tool"
make -C native binfmt_tool >/dev/null
./native/binfmt_tool verify "$BIN"

echo "== 3/4 decode smoke"
python - "$BIN" <<'EOF'
import os, sys
import jax
if os.environ.get("RWKV_GATE_DEVICE") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from rwkv_tpu.runtime.engine import RWKV
eng = RWKV(sys.argv[1])
eng.load_tokenizer()  # bundled 50,277-entry vocab
out = eng.generate("The capital of France is", max_tokens=24, temp=0.0001,
                   tau=0.95, seed=0)
print("greedy-ish:", out.strip()[:200])
eng.reset_state()
out = eng.generate("Once upon a time", max_tokens=32, seed=7)
print("sampled  :", out.strip()[:200])
assert out.strip(), "empty generation from a real checkpoint"
EOF

echo "== 4/4 perplexity gate (u8 vs fp32, delta <= 0.05)"
python - "$PTH" "$BIN" "$EVAL_TXT" <<'EOF'
import os, sys
import jax
if os.environ.get("RWKV_GATE_DEVICE") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np
from rwkv_tpu.eval.ppl import evaluate_nll
from rwkv_tpu.io.binfmt import read_bin
from rwkv_tpu.io.convert import load_pth
from rwkv_tpu.tokenizer.bpe import BPETokenizer

pth, binp, eval_txt = sys.argv[1], sys.argv[2], sys.argv[3]
tok = BPETokenizer.load()
if eval_txt and os.path.isfile(eval_txt):
    text = open(eval_txt, encoding="utf-8").read()[:200_000]
else:
    # no eval set supplied: a small built-in English sample (order-of-
    # magnitude gate only; supply real eval text for the recorded number)
    text = ("In a quiet village nestled between two hills, the baker rose "
            "before dawn to knead the day's bread. " * 120)
ids = np.asarray(tok.encode(text), np.int32)
print(f"eval tokens: {len(ids)}")

q = evaluate_nll(read_bin(binp), ids)        # u8 engine weights
f = evaluate_nll(load_pth(pth), ids)         # fp32 reference weights
d = q["nll"] - f["nll"]
print(f"NLL fp32={f['nll']:.4f} (ppl {f['ppl']:.2f})  "
      f"u8={q['nll']:.4f} (ppl {q['ppl']:.2f})  delta={d:+.4f}")
if abs(d) > 0.05:
    print("FAIL: |delta| > 0.05"); sys.exit(1)
print("PASS: quantization quality gate met")
EOF

echo "gate complete: $BIN"
