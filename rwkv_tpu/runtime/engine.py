"""The inference engine: the TPU-native equivalent of the reference `RWKV`
class (include/rwkv/rwkv/rwkv.h:245-429), API-compatible in spirit:

  reference                      here
  ---------------------------   -------------------------------------------
  loadFile(path, maxGPT)         load_file(path, max_streams) / loadFile alias
  loadTokenizer(vocabPath)       load_tokenizer(vocab_dir) / loadTokenizer
  forward(token)                 forward(token)            (GPT, 1 token)
  forward(vector, MODE)          forward(list, mode=...)
  loadContext(str)               load_context(text)        (bucketed chunks)
  emptyState()                   empty_state() / reset_state()
  RWKVState snapshot/copy        get_state()/set_state()   (free: functional)

Design deltas that matter for TPU performance:
  * state lives in HBM across calls — the reference re-uploads/downloads all
    5 state tensors + logits every token (rwkv.h:353, :372); here only the
    sampled token id crosses the host boundary during generation.
  * sampling is on-device and fused into the decode step (one jit).
  * prompt ingest pads into a small set of jit buckets (no recompile per
    prompt length) and uses the parallel WKV scan.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    RWKVParams,
    WKVState,
    forward_seq,
    forward_step,
    init_state,
)
from rwkv_tpu.ops.sampling import typical
from rwkv_tpu.tokenizer.bpe import BPETokenizer, StreamDecoder


class Mode(enum.Enum):
    GPT = "gpt"            # sequential ingest of a token sequence, one stream
    PARALLEL = "parallel"  # advance B independent streams one token each

    # reference spelling (enum.h:2-5)
    PARRALEL = "parallel"


class RWKV:
    """Stateful convenience engine over the functional model core."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        vocab_dir: Optional[str] = None,
        *,
        max_streams: int = 1,
        prefill_buckets: Sequence[int] = (32, 128, 512),
        sharding=None,
    ):
        self.params: Optional[RWKVParams] = None
        self.config: Optional[RWKVConfig] = None
        self.tokenizer: Optional[BPETokenizer] = None
        self.max_streams = max_streams
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self._sharding = sharding
        self._state: Optional[WKVState] = None  # leaves [L, B, E]

        self._jit_step = jax.jit(forward_step)
        self._jit_prefill = jax.jit(
            partial(forward_seq, parallel=True), static_argnames=()
        )
        self._jit_decode = jax.jit(self._fused_decode)

        if model_path:
            self.load_file(model_path, max_streams)
        if vocab_dir:
            self.load_tokenizer(vocab_dir)

    # -- loading -------------------------------------------------------------

    def load_file(self, path: str, max_streams: Optional[int] = None) -> None:
        """Load a .bin checkpoint (streaming, reference-format)."""
        from rwkv_tpu.io.binfmt import read_bin

        if max_streams is not None:
            self.max_streams = max_streams
        put = None
        if self._sharding is not None:
            from rwkv_tpu.parallel.sharding import make_put

            put = make_put(self._sharding)
        self.load_params(read_bin(path, put=put))

    def load_params(self, params: RWKVParams) -> None:
        """Use an already-built params pytree (tests, converters, sharded)."""
        self.params = params
        self.config = params.config
        self.reset_state()

    def load_tokenizer(self, vocab_dir: str) -> None:
        self.tokenizer = BPETokenizer.load(vocab_dir)

    # reference-spelling aliases
    loadFile = load_file
    loadTokenizer = load_tokenizer

    # -- state management ------------------------------------------------------

    def _require_loaded(self):
        if self.params is None:
            raise RuntimeError("RWKV not loaded (call load_file/load_params)")

    def reset_state(self, stream: Optional[int] = None) -> None:
        self._require_loaded()
        if stream is None or self._state is None:
            self._state = init_state(self.config, (self.max_streams,))
        else:
            empty = init_state(self.config)
            self.set_state(empty, stream)

    def empty_state(self) -> WKVState:
        """A fresh single-stream state pytree (leaves [L, E])."""
        self._require_loaded()
        return init_state(self.config)

    emptyState = empty_state

    def get_state(self, stream: int = 0) -> WKVState:
        """Snapshot one stream's state. O(1) conceptual copy (functional)."""
        self._check_stream(stream)
        return jax.tree.map(lambda a: a[:, stream], self._state)

    def set_state(self, state: WKVState, stream: int = 0) -> None:
        self._check_stream(stream)
        self._state = jax.tree.map(
            lambda pool, s: pool.at[:, stream].set(s), self._state, state
        )

    def _check_stream(self, stream: int):
        self._require_loaded()
        if not 0 <= stream < self.max_streams:
            raise IndexError(
                f"stream {stream} out of range (max_streams={self.max_streams})"
            )

    # -- forward ----------------------------------------------------------------

    def forward(
        self,
        tokens: int | Sequence[int],
        mode: Mode = Mode.GPT,
        stream: int = 0,
    ) -> jax.Array:
        """Advance state and return logits (device array; np.asarray to pull).

        GPT mode: `tokens` is a sequence ingested in order into `stream`;
        returns final-position logits [V].
        PARALLEL mode: `tokens` has one token per stream; every stream
        advances one step; returns [B, V].
        """
        self._require_loaded()
        if mode is Mode.PARALLEL:
            toks = jnp.asarray(tokens, jnp.int32)
            if toks.shape != (self.max_streams,):
                raise ValueError(
                    f"PARALLEL mode needs one token per stream "
                    f"({self.max_streams}), got shape {toks.shape}"
                )
            # state pool leaves are [L, B, E]; forward_step broadcasts over B
            logits, self._state = self._jit_step(self.params, toks, self._state)
            return logits

        if isinstance(tokens, (int, np.integer)):
            tokens = [int(tokens)]
        tokens = list(tokens)
        self._check_stream(stream)
        state = self.get_state(stream)
        logits = None
        for chunk_start in range(0, len(tokens), self.prefill_buckets[-1]):
            chunk = tokens[chunk_start : chunk_start + self.prefill_buckets[-1]]
            if len(chunk) == 1:
                logits, state = self._jit_step(
                    self.params, jnp.asarray(chunk[0], jnp.int32), state
                )
            else:
                bucket = next(b for b in self.prefill_buckets if b >= len(chunk))
                padded = np.zeros((bucket,), np.int32)
                padded[: len(chunk)] = chunk
                logits, state = self._jit_prefill(
                    self.params,
                    jnp.asarray(padded),
                    state,
                    length=jnp.asarray(len(chunk), jnp.int32),
                )
        self.set_state(state, stream)
        return logits

    def load_context(self, text: str, progress: bool = False, stream: int = 0) -> int:
        """Tokenize + ingest a prompt; returns the last token id
        (reference rwkv.h:395-413)."""
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        ids = self.tokenizer.encode(text)
        if not ids:
            return -1
        self.forward(ids, Mode.GPT, stream=stream)
        return ids[-1]

    loadContext = load_context

    # -- generation ----------------------------------------------------------------

    @staticmethod
    def _fused_decode(params, token, state, key, temp, tau, ban):
        """One decode step + typical sampling, fused into a single program so
        only the token id leaves the device."""
        logits, state = forward_step(params, token, state)
        logits = jnp.where(ban, -1e9, logits)
        key, sub = jax.random.split(key)
        nxt = typical(sub, logits, temp=temp, tau=tau).astype(jnp.int32)
        return nxt, state, key

    def generate(
        self,
        prompt: str = "",
        max_tokens: int = 128,
        *,
        temp: float = 0.9,
        tau: float = 0.8,
        seed: int = 0,
        stream: int = 0,
        ban_tokens: Sequence[int] = (0,),
        stop: Optional[Sequence[str]] = None,
        on_text: Optional[Callable[[str], None]] = None,
    ) -> str:
        """Prompt-and-generate with typical sampling (the reference apps' loop,
        examples/terminalchat/chat.cpp:75-88, minus the per-token D2H)."""
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        self._require_loaded()

        last = self.load_context(prompt, stream=stream) if prompt else 0
        state = self.get_state(stream)
        key = jax.random.PRNGKey(seed)
        ban = np.zeros((self.config.vocab_size,), bool)
        for t in ban_tokens:
            ban[t] = True
        ban = jnp.asarray(ban)

        token = jnp.asarray(last, jnp.int32)
        decoder = StreamDecoder(self.tokenizer)
        pieces: list[str] = []
        text = ""
        for _ in range(max_tokens):
            token, state, key = self._jit_decode(
                self.params, token, state, key,
                jnp.float32(temp), jnp.float32(tau), ban,
            )
            piece = decoder.feed([int(token)])
            if piece:
                pieces.append(piece)
                if on_text:
                    on_text(piece)
            if stop:
                text = "".join(pieces)
                if any(s in text for s in stop):
                    for s in stop:
                        idx = text.find(s)
                        if idx >= 0:
                            text = text[:idx]
                    break
        else:
            text = "".join(pieces) + decoder.flush()

        self.set_state(state, stream)
        return text
