"""State-as-embedding vector store (reference: examples/vectordb/
vectordb.cpp:28-58 — stores the ffn token-shift state `dd` per fact and
ranks by L1/L2 distance).

The RWKV recurrent state after reading a text is a fixed-size summary of it;
the reference uses the last-layer dd vector as a free text embedding. Same
idea here, plus cosine similarity and batch queries.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from rwkv_tpu.apps._common import add_model_args, build_engine


class StateVectorDB:
    def __init__(self, engine, metric: str = "l2", layers: str = "last"):
        self.eng = engine
        self.metric = metric
        self.layers = layers
        self.keys: list[str] = []
        self.vecs: list[np.ndarray] = []

    def _embed(self, text: str) -> np.ndarray:
        self.eng.reset_state(0)
        self.eng.load_context(text)
        state = self.eng.get_state(0)
        dd = np.asarray(state.dd)  # [L, E]
        v = dd[-1] if self.layers == "last" else dd.reshape(-1)
        return v.astype(np.float64)

    def add(self, text: str) -> None:
        self.keys.append(text)
        self.vecs.append(self._embed(text))

    def query(self, text: str, k: int = 3) -> list[tuple[str, float]]:
        if not self.vecs:
            return []
        q = self._embed(text)
        m = np.stack(self.vecs)
        if self.metric == "l1":
            d = np.abs(m - q).sum(axis=1)
        elif self.metric == "cosine":
            d = 1.0 - (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q) + 1e-9)
        else:  # l2
            d = np.linalg.norm(m - q, axis=1)
        order = np.argsort(d)[:k]
        return [(self.keys[i], float(d[i])) for i in order]


FACTS = [
    "The capital of France is Paris.",
    "Water boils at 100 degrees Celsius at sea level.",
    "The Great Wall of China is visible from low Earth orbit.",
    "Python is a popular programming language.",
    "The mitochondria is the powerhouse of the cell.",
]


def main(argv=None):
    p = argparse.ArgumentParser(description="RWKV state-embedding vector DB")
    add_model_args(p)
    p.add_argument("--metric", choices=["l1", "l2", "cosine"], default="l2")
    p.add_argument("--query", default="Which city is the capital of France?")
    p.add_argument("--top-k", type=int, default=3)
    args = p.parse_args(argv)

    eng = build_engine(args)
    db = StateVectorDB(eng, metric=args.metric)
    for fact in FACTS:
        print(f"indexing: {fact}", file=sys.stderr)
        db.add(fact)

    print(f"\nquery: {args.query}")
    for text, dist in db.query(args.query, args.top_k):
        print(f"  {dist:10.4f}  {text}")


if __name__ == "__main__":
    main()
