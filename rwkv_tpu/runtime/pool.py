"""Continuous-batching inference pool.

The production equivalent of the reference's PARRALEL mode (N independent
conversations advanced one token per kernel launch, rwkv.cu:238-239) plus
what the reference lacks: slot lifecycle. Requests join and leave the batch
at any step; one fused device program advances every active slot (forward +
per-slot-temperature typical sampling), and only the B sampled token ids
cross to the host, where stop-string/length bookkeeping runs.

State pool: WKVState leaves [L, B, E] resident in HBM. Freed slots are
reset to the empty state lazily on reuse.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.rwkv4 import (
    RWKVParams,
    WKVState,
    forward_seq,
    forward_step,
    init_state,
)
from rwkv_tpu.ops.sampling import typical
from rwkv_tpu.utils.metrics import metrics
from rwkv_tpu.utils.text import StopScanner
from rwkv_tpu.tokenizer.bpe import BPETokenizer, StreamDecoder


def prng_key_np(seed: int) -> np.ndarray:
    """`jax.random.PRNGKey(seed)` materialized host-side with ZERO device
    dispatches: the threefry2x32 key layout is the seed's int64 bits split
    as [hi32, lo32] uint32 (pinned against jax in tests/test_pool.py).
    On the tunneled TPU each PRNGKey round-trip costs the ~30 ms dispatch
    floor — an admission burst must not pay it per request."""
    bits = int(seed) & 0xFFFFFFFFFFFFFFFF  # two's complement, like int64
    if not jax.config.jax_enable_x64:      # x32 mode truncates the seed
        bits &= 0xFFFFFFFF
    return np.array([(bits >> 32) & 0xFFFFFFFF, bits & 0xFFFFFFFF],
                    np.uint32)


@dataclasses.dataclass
class Request:
    rid: int
    prompt_ids: list[int]
    max_tokens: int
    temp: float
    tau: float
    seed: int
    stop: Optional[Sequence[str]]
    on_text: Optional[Callable[[str], None]]
    ban_tokens: Sequence[int] = (0,)
    # runtime
    slot: int = -1
    produced: int = 0
    decoder: Optional[StreamDecoder] = None
    pieces: list = dataclasses.field(default_factory=list)
    done: bool = False
    text: str = ""
    # windowed stop-string detection, shared with engine.generate
    # (utils/text.py): O(len(piece)) per token, tracks the earliest
    # match's global index for exact truncation
    scanner: Optional[StopScanner] = None

    def saw_stop(self, piece: str) -> bool:
        return self.scanner.feed(piece) if self.scanner else False


class InferencePool:
    def __init__(
        self,
        params: RWKVParams,
        tokenizer: BPETokenizer,
        max_streams: int = 8,
        prefill_bucket: int = 128,
        step_fn: Optional[Callable] = None,
        prefill_dtype=jnp.float32,
        step_chunk: int = 1,
        prefill_fn: Optional[Callable] = None,
    ):
        """step_fn: the per-token forward (params, tokens, state) ->
        (logits, state); defaults to the XLA forward_step. Pass
        ops.pallas.decode_stack.forward_step_fused (with signedized params)
        to run the batch on the fused kernel on a real TPU.

        prefill_fn: batched prompt ingest (params, tokens [T, W], state,
        length [W]) -> (logits [W, V], state); defaults to the plain
        forward_seq parallel scan. For a SHARDED engine pass its
        engine._prefill_impl (parallel.tp_step.make_engine_prefill) so
        admission prefill runs the minimal 3L+2 collective schedule instead
        of GSPMD's ~8 collectives per block.

        prefill_dtype: jnp.bfloat16 doubles prompt-ingest throughput
        (compute-bound path; see BENCH_NOTES.md).

        step_chunk: decode this many tokens per device dispatch for the
        whole batch (lax.scan over the batched step; identical token
        streams). Trades dispatch overhead against request admission /
        stop-string latency, both of which lag by up to step_chunk-1
        steps; finished slots keep decoding (masked) until the chunk
        ends, which is free at memory-bound batch sizes."""
        from rwkv_tpu.utils.cache import configure_cache

        configure_cache()  # warm restarts for standalone pool users too
        self.params = params
        self.cfg = params.config
        self.tok = tokenizer
        self.B = max_streams
        self.prefill_bucket = prefill_bucket
        self._step_impl = step_fn or forward_step
        self._prefill_fn = prefill_fn
        self.prefill_dtype = prefill_dtype
        # admission-burst width buckets: prefill is MXU-compute-bound, so
        # its FLOPs scale with the padded lane count — admitting 1 prompt
        # into an 8-slot pool at fixed width B would burn ~8x the needed
        # FLOPs (real money at 14B). Powers of two up to B: <= log2(B)+1
        # compiled prefill programs, cost ~2x the live lanes worst-case.
        self._widths = sorted({1 << i for i in range((self.B).bit_length())
                               if 1 << i <= self.B} | {self.B})

        self.step_chunk = max(1, int(step_chunk))
        self._state = init_state(self.cfg, (self.B,))
        self._tokens = np.zeros((self.B,), np.int32)
        self._active = np.zeros((self.B,), bool)
        self._keys = np.stack([prng_key_np(i) for i in range(self.B)])
        self._temp = np.full((self.B,), 1.0, np.float32)
        self._tau = np.full((self.B,), 0.8, np.float32)
        # per-slot banned-token mask at the padded vocab width (set from
        # each request's ban_tokens at admission)
        self._ban = np.zeros((self.B, self.cfg.vocab_size), bool)
        self._ban[:, 0] = True

        self._free = list(range(self.B))
        self._by_slot: dict[int, Request] = {}
        self._queue: list[Request] = []
        self._next_rid = 0
        # requests that COMPLETED during an admission batch that later
        # threw: their results survive the exception and are delivered by
        # the next step() (or fetched directly via take_finished_backlog)
        self._finished_backlog: list[Request] = []

        self._jit_step = jax.jit(self._batched_step)
        self._jit_step_k = jax.jit(self._batched_step_k,
                                   static_argnames=("k",))
        self._jit_prefill = jax.jit(self._prefill)
        self._jit_admit = jax.jit(self._admit_sample)

    # -- device programs ------------------------------------------------------

    def _batched_step(self, params, tokens, state, keys, temp, tau, active,
                      ban):
        """Advance all B slots one token; sample per-slot params.

        Inactive slots still compute (lockstep batch — that's the point of
        continuous batching: the marginal cost of a dead slot is zero at
        memory-bound batch sizes) but their state update is masked out.
        """
        logits, new_state = self._step_impl(params, tokens, state)  # [B, V]
        logits = jnp.where(ban, -1e9, logits)  # per-slot banned ids

        def sample_one(key, lg, t, ta):
            key, sub = jax.random.split(key)
            return key, typical(sub, lg, temp=t, tau=ta).astype(jnp.int32)

        keys, nxt = jax.vmap(sample_one)(keys, logits, temp, tau)
        # mask state for inactive slots (keep old state)
        act = active[None, :, None]  # broadcast over [L, B, E]
        state = WKVState(*(jnp.where(act, n, o) for n, o in zip(new_state, state)))
        nxt = jnp.where(active, nxt, 0)
        return nxt, state, keys

    def _batched_step_k(self, params, tokens, state, keys, temp, tau,
                        active, ban, *, k):
        """k batched steps in one device program; returns tokens [k, B]."""
        def body(carry, _):
            toks, st, ky = carry
            toks, st, ky = self._batched_step(
                params, toks, st, ky, temp, tau, active, ban)
            return (toks, st, ky), toks

        (toks, state, keys), hist = jax.lax.scan(
            body, (tokens, state, keys), None, length=k
        )
        return hist, state, keys

    def _admit_sample(self, logits, keys, temp, tau, ban):
        """First-token sampling for a whole admission burst in ONE device
        program: [W, V] logits, per-request keys/temps/taus/ban rows,
        vmapped typical(). Identical key-split order per lane as the old
        one-request-at-a-time path, so token streams are unchanged."""
        def one(key, lg, t, ta, bn):
            key, sub = jax.random.split(key)
            lg = jnp.where(bn, -1e9, lg)
            return typical(sub, lg, temp=t, tau=ta).astype(jnp.int32), key

        return jax.vmap(one)(keys, logits, temp, tau, ban)

    def _prefill(self, params, tokens, length, slot_state):
        """Prompt ingest (parallel WKV scan), bucketed. tokens [T] with a
        scalar length, or [T, Bn] with [Bn] ragged per-stream lengths —
        several queued prompts share one weight sweep."""
        if self._prefill_fn is not None:
            # sharded TP prefill (make_engine_prefill signature)
            return self._prefill_fn(params, tokens, slot_state, length)
        logits, new_state = forward_seq(
            params, tokens, slot_state, parallel=True, length=length,
            compute_dtype=self.prefill_dtype,
        )
        return logits, new_state

    # -- public API -------------------------------------------------------------

    def submit(
        self,
        prompt: str,
        max_tokens: int = 128,
        *,
        temp: float = 0.9,
        tau: float = 0.8,
        seed: Optional[int] = None,
        stop: Optional[Sequence[str]] = None,
        on_text: Optional[Callable[[str], None]] = None,
        ban_tokens: Sequence[int] = (0,),
    ) -> int:
        rid = self._next_rid
        self._next_rid += 1
        req = Request(
            rid=rid,
            prompt_ids=self.tok.encode(prompt) or [0],
            max_tokens=max_tokens,
            temp=temp,
            tau=tau,
            seed=seed if seed is not None else rid,
            stop=stop,
            on_text=on_text,
            ban_tokens=tuple(ban_tokens),
        )
        req.scanner = StopScanner(stop) if stop else None
        self._queue.append(req)
        return rid

    @property
    def pending(self) -> int:
        return len(self._queue) + len(self._by_slot)

    def cancel_queued(self, rid: int) -> bool:
        """Remove a not-yet-admitted request from the queue (the server's
        submit-timeout path). Returns False when the request was already
        admitted (it will finish and must be discarded by the caller)."""
        for i, req in enumerate(self._queue):
            if req.rid == rid:
                del self._queue[i]
                return True
        return False

    def abort_all(self) -> None:
        """Drop every queued and in-flight request and free their slots
        (used by servers to recover after a poisoned step)."""
        self._queue.clear()
        for slot in list(self._by_slot):
            self._active[slot] = False
            del self._by_slot[slot]
            self._free.append(slot)

    def _admit(self):
        """Admit every queued request a free slot can take, prefilling ALL
        of them in one ragged [T, Bn] batched sweep per bucket chunk (the
        reference ingests one prompt at a time; a prompt burst here costs
        ~one weight stream instead of Bn)."""
        n = min(len(self._queue), len(self._free))
        if n == 0:
            return []
        reqs = [self._queue.pop(0) for _ in range(n)]
        slots = [self._free.pop(0) for _ in range(n)]
        try:
            return self._admit_batch(reqs, slots)
        except BaseException:
            # A failed admission must not leak capacity — but some of the
            # batch may already be FINISHED (first-token completion calls
            # _finish, which freed that slot) or fully registered, so roll
            # back per request: done requests keep their completed result
            # (stashed in _finished_backlog so the exception cannot lose
            # it); everything else is de-registered, its slot freed
            # exactly once, and requeued with RESET runtime state (a retry
            # re-prefills from scratch; a piece already streamed via
            # on_text may repeat — the cost of not losing the request).
            requeue = []
            for req, slot in zip(reqs, slots):
                if req.done:
                    self._finished_backlog.append(req)
                    continue
                if self._by_slot.get(slot) is req:
                    del self._by_slot[slot]
                self._active[slot] = False
                if slot not in self._free:
                    self._free.append(slot)
                req.slot = -1
                req.produced = 0
                req.decoder = None
                req.pieces = []
                req.scanner = StopScanner(req.stop) if req.stop else None
                requeue.append(req)
            self._queue[:0] = requeue
            raise

    def _admit_batch(self, reqs, slots):
        """Returns requests that finished ON their first (admission) token."""
        done_at_admit: list[Request] = []
        n = len(reqs)
        for req, slot in zip(reqs, slots):
            req.slot = slot
            req.decoder = StreamDecoder(self.tok)

        ids = [req.prompt_ids for req in reqs]
        K = self.prefill_bucket
        maxlen = max(len(i) for i in ids)
        # bucketed batch width: zero-length lanes are exact no-ops, so pad
        # the burst to the next power-of-two bucket (see _widths) — a
        # single admission pays ~1 lane of prefill FLOPs, not B
        W = next(w for w in self._widths if w >= n)
        batch_state = init_state(self.cfg, (W,))
        chunk_lg: list = [None] * n   # last device logits per stream
        for c0 in range(0, maxlen, K):
            chunk = np.zeros((K, W), np.int32)
            lens = np.zeros((W,), np.int32)
            for b, seq in enumerate(ids):
                part = seq[c0:c0 + K]
                chunk[: len(part), b] = part
                lens[b] = len(part)
            # full-chunk fast path: when every REAL lane carries exactly K
            # valid tokens, dispatch the unmasked program (length=None) —
            # no ragged mask/carry selects (~15-20% faster; see
            # tools/prefill_overhead_probe.py). Width-pad lanes (b >= n)
            # then compute garbage that is never scattered (s[:, :n]).
            full = all(len(seq) >= c0 + K for seq in ids)
            lg, batch_state = self._jit_prefill(
                self.params, jnp.asarray(chunk),
                None if full else jnp.asarray(lens, jnp.int32), batch_state,
            )
            # no host sync here: keep the device array; only the LAST
            # chunk with valid tokens per stream holds its final logits
            for b in range(n):
                if lens[b] > 0:
                    chunk_lg[b] = lg[b]

        # scatter prefilled states into the pool slots
        slot_idx = jnp.asarray(slots, jnp.int32)
        self._state = jax.tree.map(
            lambda pool, s: pool.at[:, slot_idx].set(s[:, :n]),
            self._state, batch_state,
        )

        # First tokens for the WHOLE burst in one vmapped device program
        # (round-3 verdict: n separate typical() dispatches each synced by
        # int(...) cost ~n x the ~30 ms tunnel dispatch floor). Padded to
        # the same power-of-two width bucket as prefill to bound compiles.
        V = self.cfg.vocab_size
        rows = np.zeros((n, V), bool)
        for b, req in enumerate(reqs):
            for t in req.ban_tokens:
                rows[b, t] = True
        keys0 = np.stack([prng_key_np(req.seed) for req in reqs])
        temps = np.asarray([req.temp for req in reqs], np.float32)
        taus = np.asarray([req.tau for req in reqs], np.float32)
        Wb = W  # same width bucket as the prefill pad above

        def padw(a):
            return (np.concatenate([a, np.repeat(a[:1], Wb - n, 0)], 0)
                    if Wb != n else a)

        lg_stack = jnp.stack(chunk_lg)
        if Wb != n:
            lg_stack = jnp.concatenate(
                [lg_stack, jnp.broadcast_to(lg_stack[:1], (Wb - n, V))], 0)
        toks_d, keys_d = self._jit_admit(
            lg_stack, jnp.asarray(padw(keys0)), jnp.asarray(padw(temps)),
            jnp.asarray(padw(taus)), jnp.asarray(padw(rows)))
        firsts = np.asarray(toks_d)          # the burst's one host sync
        new_keys = np.asarray(keys_d)

        for b, (req, slot) in enumerate(zip(reqs, slots)):
            self._ban[slot] = rows[b]
            first = int(firsts[b])
            self._tokens[slot] = first
            self._keys[slot] = new_keys[b]
            self._temp[slot] = req.temp
            self._tau[slot] = req.tau
            self._active[slot] = True
            self._by_slot[slot] = req
            piece = self._emit(req, first)
            # the first token can already satisfy the request (max_tokens=1,
            # or a stop string contained in its piece)
            if (piece and req.saw_stop(piece)) or req.produced >= req.max_tokens:
                done_at_admit.append(self._finish(req))
        return done_at_admit

    def _on_text(self, req: Request, piece: str) -> None:
        """Deliver a text piece to the request's callback, isolating the
        pool from callback failures: a streaming client whose socket died
        mid-request must not take down the shared batch (the callback is
        muted after its first exception; decoding continues and the text
        is still assembled in req.pieces)."""
        if req.on_text is None:
            return
        try:
            req.on_text(piece)
        except Exception as e:  # noqa: BLE001 — user callback, any error
            import sys

            metrics.inc("pool.on_text_errors")
            print(f"[pool] on_text failed for rid={req.rid}: {e!r}; "
                  "muting callback", file=sys.stderr)
            req.on_text = None

    def _emit(self, req: Request, token: int) -> str:
        req.produced += 1
        metrics.inc("pool.tokens_decoded")  # real tokens absorbed into a
        piece = req.decoder.feed([token])   # request, not lockstep garbage
        if piece:
            req.pieces.append(piece)
            self._on_text(req, piece)
        return piece

    def _finish(self, req: Request) -> Request:
        tail = req.decoder.flush() if req.decoder else ""
        if tail:
            req.pieces.append(tail)
            self._on_text(req, tail)
            if req.scanner:
                req.scanner.feed(tail)  # a stop may complete in the tail
        text = "".join(req.pieces)
        if req.scanner and req.scanner.cut is not None:
            text = text[: req.scanner.cut]
        req.text = text
        req.done = True
        metrics.inc("pool.requests_completed")
        slot = req.slot
        self._active[slot] = False
        del self._by_slot[slot]
        self._free.append(slot)
        return req

    def take_finished_backlog(self) -> list[Request]:
        """Completed requests stranded by an admission exception (see
        _admit). Servers call this in their error path so a client whose
        generation actually finished gets its text, not the error."""
        out, self._finished_backlog = self._finished_backlog, []
        return out

    def step(self) -> list[Request]:
        """Admit queued requests, advance the batch step_chunk tokens in
        one device dispatch; returns requests that completed."""
        finished_admit = self.take_finished_backlog() + self._admit()
        if not self._by_slot:
            return finished_admit

        k = self.step_chunk
        args = (
            self.params,
            jnp.asarray(self._tokens),
            self._state,
            jnp.asarray(self._keys),
            jnp.asarray(self._temp),
            jnp.asarray(self._tau),
            jnp.asarray(self._active),
            jnp.asarray(self._ban),
        )
        if k == 1:
            nxt, self._state, keys = self._jit_step(*args)
            hist = np.asarray(nxt)[None]  # [1, B]
        else:
            hist_d, self._state, keys = self._jit_step_k(*args, k=k)
            hist = np.asarray(hist_d)     # [k, B]
        self._keys = np.array(keys)
        metrics.inc("pool.steps")

        finished = list(finished_admit)
        for slot, req in list(self._by_slot.items()):
            for row in hist:
                token = int(row[slot])
                self._tokens[slot] = token
                piece = self._emit(req, token)
                # windowed stop scan: O(len(piece)), not O(total text)
                hit_stop = req.saw_stop(piece) if piece else False
                if req.produced >= req.max_tokens or hit_stop:
                    finished.append(self._finish(req))
                    break
        return finished

    def run(self) -> dict[int, str]:
        """Drain everything; returns {rid: completion_text}."""
        out = {}
        while self.pending:
            for req in self.step():
                out[req.rid] = req.text
        return out
