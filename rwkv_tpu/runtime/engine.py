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
from typing import Callable, Optional, Sequence

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
        prefill_dtype=jnp.float32,
        tp_body: Optional[str] = None,
        tp_pretile: Optional[bool] = None,
        quant: str = "q8",
    ):
        # Persistent XLA compile cache for every engine user (server, CLI,
        # library): production-shape kernels compile in minutes cold
        # (885 s at 430M/B=16 pretiled, BENCH_NOTES) and ~0 s warm.
        # Env-overridable; RWKV_TPU_CACHE_DIR=off disables.
        from rwkv_tpu.utils.cache import configure_cache

        configure_cache()
        self.params: Optional[RWKVParams] = None
        self.config: Optional[RWKVConfig] = None
        self.tokenizer: Optional[BPETokenizer] = None
        self.max_streams = max_streams
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self._sharding = sharding
        # TP step body under sharding: None = auto (on TPU: the 'fused'
        # in-kernel-RDMA whole-stack kernel when E/tp is lane-aligned; on
        # CPU backends: 'pallas' half-kernels; else 'xla') — see
        # parallel/tp_step.py
        self._tp_body = tp_body
        # Sharded weight layout: None = auto (pretile the contiguous-block
        # layout when serving batches, max_streams >= 8 — measured policy
        # in BENCH_NOTES round 3); True/False forces it either way.
        self._tp_pretile = tp_pretile
        # 'q8' (reference Q8_0 parity) or 'q4' (nibble-packed 4-bit:
        # half the HBM bytes/token, 1.4-1.9x decode, 14B in ~7GB —
        # BENCH_NOTES round-4). q4 ingest needs a DENSE source
        # (.pth/.safetensors); .bin files are Q8-quantized already and
        # restacking 4-bit on top would double the noise. Under
        # sharding, q4 runs the fused in-kernel-RDMA TP body with the
        # tile the families were packed for.
        if quant not in ("q8", "q4"):
            raise ValueError(f"quant must be 'q8' or 'q4', got {quant!r}")
        self.quant = quant
        self._state: Optional[WKVState] = None  # leaves [L, B, E]
        self._last_logits: dict[int, jax.Array] = {}  # stream -> logits [V]
        self._pending: dict[int, int] = {}  # emitted-but-not-absorbed token

        # bf16 prefill: ~4x MXU rate on the compute-bound prompt-ingest
        # path, f32 accumulation; decode is unaffected (HBM-bound).
        self.prefill_dtype = prefill_dtype
        self._step_fn = forward_step
        self._prefill_impl = None  # None -> forward_seq; sharded: tp prefill
        self._make_jits()

        if model_path:
            self.load_file(model_path, max_streams)
        if vocab_dir:
            self.load_tokenizer(vocab_dir)

    # -- loading -------------------------------------------------------------

    def load_file(self, path: str, max_streams: Optional[int] = None) -> None:
        """Load a .bin checkpoint (streaming, reference-format), a
        .safetensors RWKV-v4 checkpoint (BlinkDL or HF-transformers naming,
        torch-free — io/safetensors.py) quantized on the fly, or a packed
        q4 artifact (io/q4fmt.py — `rwkv-tpu-convert --quant q4`; loads in
        one streaming pass, no requantize, quant mode auto-selected)."""
        from rwkv_tpu.io.binfmt import read_bin

        if max_streams is not None:
            self.max_streams = max_streams
        if path.endswith(".safetensors"):
            from rwkv_tpu.io.q4fmt import is_q4_file, load_q4

            if is_q4_file(path):
                if self.quant not in (None, "q4", "q8"):
                    raise ValueError(
                        f"quant={self.quant!r} engine cannot load a packed "
                        f"q4 artifact ({path})")
                self.quant = "q4"
                self.load_params(load_q4(path))
                return
        if path.endswith((".safetensors", ".pth")):
            from rwkv_tpu.io.convert import load_checkpoint_quantized

            # Streaming per-family quantize (peak host RAM ~ the quantized
            # pytree, not 2x dense float32 — a 14B stays ~15 GB);
            # load_params then applies the same pad/signedize/pretile/shard
            # policies the .bin path gets from read_bin.
            q4_tile = None
            if self.quant == "q4" and self._sharding is not None:
                # the pack block must equal the TP kernel tile, which
                # depends on the mesh width + serving batch: pick it from
                # the checkpoint dims BEFORE the streaming quantize
                from rwkv_tpu.io.convert import checkpoint_dims
                from rwkv_tpu.ops.pallas.decode_stack_tp import (
                    pick_tp_fused_tile)

                mesh = getattr(self._sharding, "mesh", self._sharding)
                tp = mesh.shape["model"]
                _, E, _ = checkpoint_dims(path)
                bp = max(8, -(-self.max_streams // 8) * 8)
                q4_tile = pick_tp_fused_tile(E, E // tp, tp, bp=bp, q4=True)
            self.load_params(load_checkpoint_quantized(
                path, bits=4 if self.quant == "q4" else 8,
                q4_tile=q4_tile))
            return
        if self.quant == "q4":
            raise ValueError(
                "quant='q4' needs a dense source (.pth/.safetensors); "
                f"{path} is a Q8-quantized .bin — requantizing 4-bit on "
                "top of Q8 would stack quantization noise"
            )
        put = None
        # Pad to 512, not the minimal 128: 50277 -> 50688 = 128*4*9*11,
        # whose rich divisor set lets pick_head_tile choose wide head tiles
        # (128-padding gives 50304 = 128*3*131 — widest usable tile 384).
        pad_to = 512
        # Host-side contiguous-block re-layout at read time — ONLY when the
        # fused kernel will actually run (mirror load_params' use_fused
        # gate), so odd-shaped checkpoints still load and fall back to the
        # XLA path, and nothing gets re-laid-out for a kernel that never
        # executes. Read-time (vs on-device pretile_params) matters because
        # the device never holds both layouts — a 14B copy would OOM 16GB.
        pretile = None
        if jax.default_backend() not in ("cpu",) and self._sharding is None:
            from rwkv_tpu.io.binfmt import read_header
            from rwkv_tpu.ops.pallas.decode_stack import pick_tile

            hdr = read_header(path)
            # ~13E^2 per layer + head; XLA's prefill-side layout copy of
            # the col-sliced families costs ~weights*0.55 extra HBM, so
            # only pretile when both fit comfortably (a 14B keeps the
            # universal layout: -0.5% decode, working prefill)
            est_bytes = hdr.n_layer * 13 * hdr.n_embd ** 2 + 50688 * hdr.n_embd
            if (hdr.n_embd % 256 == 0 and hdr.n_ffn % 256 == 0
                    and est_bytes < 8e9):
                pretile = pick_tile(hdr.n_embd)
        if self._sharding is not None:
            import math

            from rwkv_tpu.parallel.sharding import make_put

            mesh = getattr(self._sharding, "mesh", self._sharding)
            put = make_put(self._sharding)
            pad_to = math.lcm(512, 128 * mesh.shape["model"])  # TP-divisible
            # Host-side pretile for the fused TP kernel (round 3): the
            # contiguous-block layout is neutral at B=1 but +28% at B=16
            # through the TP kernel (BENCH_NOTES round-3). Same gates as
            # the single-chip path (est<8GB for prefill's layout copy) +
            # lane alignment per shard; the block dim shards evenly
            # because the tile divides E/tp.
            want_pt = (self.max_streams >= 8 if self._tp_pretile is None
                       else self._tp_pretile)
            if (jax.default_backend() not in ("cpu",)
                    and self._tp_body in (None, "fused")
                    and want_pt):
                from rwkv_tpu.io.binfmt import read_header
                from rwkv_tpu.ops.pallas.decode_stack_tp import (
                    pick_tp_fused_tile)

                hdr = read_header(path)
                tp = mesh.shape["model"]
                est = hdr.n_layer * 13 * hdr.n_embd ** 2 + 50688 * hdr.n_embd
                if (hdr.n_embd % tp == 0 and (hdr.n_embd // tp) % 128 == 0
                        and hdr.n_ffn % tp == 0
                        and (hdr.n_ffn // tp) % 128 == 0
                        and est < 8e9):
                    bp = max(8, -(-self.max_streams // 8) * 8)
                    try:
                        pretile = pick_tp_fused_tile(
                            hdr.n_embd, hdr.n_embd // tp, tp, bp=bp)
                    except ValueError:
                        pretile = None  # no feasible tile at this bp
        # signed=True: re-center u8->int8 on the host copy before upload —
        # upload-then-signedize holds both copies on device and
        # ResourceExhausts a 16GB chip at 14B (load_params' signedize
        # then no-ops on the already-int8 families)
        self.load_params(
            read_bin(path, put=put, pad_vocab_to=pad_to, pretile=pretile,
                     signed=True))

    def _make_jits(self) -> None:
        step = self._step_fn

        def decode(params, token, state, key, temp, tau, ban):
            logits, state = step(params, token, state)
            logits = jnp.where(ban, -1e9, logits)
            key, sub = jax.random.split(key)
            nxt = typical(sub, logits, temp=temp, tau=tau).astype(jnp.int32)
            return nxt, state, key

        def decode_k(params, token, state, key, temp, tau, ban, *, k):
            # k sampled steps in ONE device program: same key-split order
            # as k single decode() calls, so token streams are identical.
            def body(carry, _):
                tok, st, ky = carry
                tok, st, ky = decode(params, tok, st, ky, temp, tau, ban)
                return (tok, st, ky), tok

            (_, state, key), toks = jax.lax.scan(
                body, (token, state, key), None, length=k
            )
            return toks, state, key

        self._jit_step = jax.jit(step)
        self._jit_decode_chunk = jax.jit(decode_k, static_argnames=("k",))
        self._jit_prefill = jax.jit(
            self._prefill_impl if self._prefill_impl is not None
            else partial(forward_seq, parallel=True,
                         compute_dtype=self.prefill_dtype))
        self._jit_decode = jax.jit(decode)
        self._jit_sample = jax.jit(self._sample)

    def load_params(
        self, params: RWKVParams, use_fused: Optional[bool] = None,
        a8: bool = False,
    ) -> None:
        """Use an already-built params pytree (tests, converters, sharded).

        use_fused: run decode steps through the single-launch Pallas
        decode-stack kernel (ops/pallas/decode_stack.py). Default: auto —
        on when running on a real TPU backend, unsharded, with quantized
        weights and tile-divisible dims (~3x decode throughput vs the
        XLA step; see BENCH_NOTES.md).

        a8: with the fused kernel, run matvecs as native s8 x s8 MXU ops
        (W8A8) — faster on widening-bound shapes, adds ~0.4% activation-
        quant noise; validate with eval/ppl.py before serving.
        """
        from rwkv_tpu.ops.quant import Quant4Linear, QuantLinear

        cfg = params.config
        q4 = isinstance(params.att.key, Quant4Linear)
        self._prefill_impl = None
        if use_fused is None:
            use_fused = (
                jax.default_backend() not in ("cpu",)
                and self._sharding is None
                and isinstance(params.att.key, (QuantLinear, Quant4Linear))
                and cfg.n_embd % 256 == 0
                and cfg.n_ffn % 256 == 0
            )
        if use_fused:
            from rwkv_tpu.models.rwkv4 import pad_vocab, signedize_params
            from rwkv_tpu.ops.pallas.decode_stack import (
                forward_step_fused, pretile_params)

            # Guarantee the head fuses into the kernel: the head tile is any
            # 128-multiple divisor of the padded vocab (pick_head_tile), so
            # lane alignment is the only requirement.
            if isinstance(params.head, (QuantLinear, Quant4Linear)):
                vp = (params.head.wp if q4 else params.head.w).shape[-1]
                if vp % 128:
                    # 512 (not the minimal 128) for divisor-richness — see
                    # the pad_to comment in load_file
                    params = pad_vocab(params, multiple=512)
                    cfg = params.config
            # contiguous-block weight layout: one linear DMA per kernel
            # block (see decode_stack.pretile_params); prefill handles the
            # 4-D weights via qmatmul's einsum path. Skip if the loader
            # already pretiled host-side (read_bin(pretile=...)) or if the
            # model is too big for prefill's layout-copy overhead (see
            # load_file). q4 packed families halve both sides of that
            # trade, and their pretile must reuse the block the row-tiled
            # families were packed for.
            params = signedize_params(params)  # q4 leaves pass through
            est = cfg.n_layer * 13 * cfg.n_embd ** 2 + 50688 * cfg.n_embd
            if q4:
                est //= 2
                if params.att.key.wp.ndim != 4 and est < 8e9:
                    params = pretile_params(
                        params, tile=params.att.output.block)
            elif params.att.key.w.ndim != 4 and est < 8e9:
                params = pretile_params(params)
            self._step_fn = (
                partial(forward_step_fused, a8=True) if a8
                else forward_step_fused
            )
        elif (self._sharding is not None
                and isinstance(params.att.key, (QuantLinear, Quant4Linear))):
            # Sharded quantized decode: the manual shard_map TP step
            # (parallel/tp_step.py) — 3L+2 collectives per token with fused
            # per-shard Pallas kernels when E/tp is lane-aligned (auto body
            # selection; XLA matvec body otherwise). This is what serving
            # runs; the GSPMD fallback (~8 collectives/block) remains only
            # for dense (unquantized) params. 4-bit families run ONLY the
            # fused body (tp_step forces it) with the tile they were
            # packed for.
            import math

            from rwkv_tpu.models.rwkv4 import pad_vocab, signedize_params
            from rwkv_tpu.parallel.tp_step import make_engine_step

            mesh = getattr(self._sharding, "mesh", self._sharding)
            tp = mesh.shape["model"]
            # the PER-SHARD vocab Vp/tp must be lane-aligned (the fused
            # body's head tiling needs it): repad unless Vp % (128*tp)==0
            # — lcm(128, tp) was wrong (50688 at tp=8 passed it with a
            # misaligned 6336-wide shard)
            head_w = params.head.wp if q4 else params.head.w
            if head_w.shape[-1] % (128 * tp):
                params = pad_vocab(params, multiple=math.lcm(512, 128 * tp))
                cfg = params.config
            params = signedize_params(params)  # q4 leaves pass through
            # contiguous-block layout for the fused TP kernel when it
            # will actually run (TPU backend, lane-aligned shards) AND
            # the engine serves batches (max_streams >= 8): at B=1 the
            # layouts measure within noise (3-D kept for the
            # latency-critical single-stream case); at B=8/16/32 pretile
            # is +6%/+4%/+27% over the best 3-D option and the only
            # VMEM-safe t=512 at B=32 (BENCH_NOTES round 3).
            # Skipped when the loader already pretiled host-side
            # (load_file passes 4-D weights through read_bin(pretile=)).
            est = cfg.n_layer * 13 * cfg.n_embd ** 2 + 50688 * cfg.n_embd
            if q4:
                est //= 2
            want_pt = (self.max_streams >= 8 if self._tp_pretile is None
                       else self._tp_pretile)
            kw = (params.att.key.wp if q4 else params.att.key.w)
            if (jax.default_backend() not in ("cpu",)
                    and self._tp_body in (None, "fused")
                    and want_pt
                    and kw.ndim == 3
                    and kw.dtype == jnp.int8
                    and cfg.n_embd % tp == 0
                    and (cfg.n_embd // tp) % 128 == 0
                    and cfg.n_ffn % tp == 0
                    and (cfg.n_ffn // tp) % 128 == 0
                    and est < 8e9):
                from rwkv_tpu.ops.pallas.decode_stack import pretile_params
                from rwkv_tpu.ops.pallas.decode_stack_tp import (
                    pick_tp_fused_tile)

                bp = max(8, -(-self.max_streams // 8) * 8)
                if q4:
                    # the pack block IS the tile — pretile with it (a
                    # different pick would fail the kernel's block check)
                    params = pretile_params(
                        params, tile=params.att.output.block)
                else:
                    try:
                        params = pretile_params(
                            params, tile=pick_tp_fused_tile(
                                cfg.n_embd, cfg.n_embd // tp, tp, bp=bp))
                    except ValueError:
                        pass  # no feasible tile at this bp: keep 3-D
            # commit the TP layout once (no-op if read_bin already placed
            # shards; prevents a full reshard on every decode step for
            # in-memory load_params callers)
            from rwkv_tpu.parallel.sharding import shard_params as _commit

            params = _commit(params, mesh)
            self._step_fn = make_engine_step(
                mesh, params, body=self._tp_body,
                tile=params.att.output.block if q4 else None)
            # sharded prefill: same minimal collective schedule + layouts
            # as the decode step (vs GSPMD's ~8 collectives per block)
            from rwkv_tpu.parallel.tp_step import make_engine_prefill

            self._prefill_impl = make_engine_prefill(
                mesh, params, compute_dtype=self.prefill_dtype)
        else:
            self._step_fn = forward_step
        self._make_jits()

        self.params = params
        self.config = cfg
        # True (unpadded) vocab: pad_vocab marks padded ids with a -1e9
        # logit_bias so they can never be sampled; the public forward() API
        # returns logits sliced back to this size (reference: out[50277]).
        if params.logit_bias is not None:
            self._true_vocab = int(
                np.count_nonzero(np.asarray(params.logit_bias) == 0.0)
            )
        else:
            self._true_vocab = cfg.vocab_size
        self.reset_state()

    def load_tokenizer(self, vocab_dir: Optional[str] = None,
                       native: Optional[bool] = None) -> None:
        """Load the BPE tokenizer; prefers the native C++ implementation
        (rwkv_tpu/tokenizer/native.py) unless native=False. vocab_dir=None
        uses the bundled 50,277-entry RWKV "20B" vocab."""
        if native is False:
            self.tokenizer = BPETokenizer.load(vocab_dir)
            return
        from rwkv_tpu.tokenizer.native import load_best

        self.tokenizer = (
            load_best(vocab_dir) if native is None
            else __import__("rwkv_tpu.tokenizer.native", fromlist=["x"])
            .NativeBPETokenizer.load(vocab_dir)
        )

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
            self._last_logits = {}
            self._pending = {}
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
        self._last_logits.pop(stream, None)
        self._pending.pop(stream, None)

    def snapshot(self, stream: int = 0) -> dict:
        """Full continuation point: state + decode bookkeeping. Cheap —
        everything is immutable device data (reference analog: RWKVState
        copy-ctor + manual lasttoken tracking, rwkv.h:173-191)."""
        self._check_stream(stream)
        return {
            "state": self.get_state(stream),
            "logits": self._last_logits.get(stream),
            "pending": self._pending.get(stream),
        }

    def restore(self, snap: dict, stream: int = 0) -> None:
        self.set_state(snap["state"], stream)
        if snap.get("logits") is not None:
            self._last_logits[stream] = snap["logits"]
        if snap.get("pending") is not None:
            self._pending[stream] = snap["pending"]

    def save_state(self, path: str, stream: int = 0) -> None:
        """Persist a stream's full continuation point to disk (the durable
        analog of the reference's in-memory RWKVState snapshots — enables
        session resume across processes)."""
        snap = self.snapshot(stream)
        arrays = {f"state_{k}": np.asarray(v)
                  for k, v in zip(WKVState._fields, snap["state"])}
        if snap.get("logits") is not None:
            arrays["logits"] = np.asarray(snap["logits"])
        if snap.get("pending") is not None:
            arrays["pending"] = np.asarray(snap["pending"], np.int64)
        np.savez_compressed(path, **arrays)

    def load_state(self, path: str, stream: int = 0) -> None:
        with np.load(path) as z:
            state = WKVState(*(jnp.asarray(z[f"state_{k}"])
                               for k in WKVState._fields))
            snap = {"state": state,
                    "logits": jnp.asarray(z["logits"]) if "logits" in z else None,
                    "pending": int(z["pending"]) if "pending" in z else None}
        self.restore(snap, stream)

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
            for i in range(self.max_streams):
                self._last_logits[i] = logits[i]
                self._pending.pop(i, None)
            return logits[..., : self._true_vocab]

        if isinstance(tokens, (int, np.integer)):
            tokens = [int(tokens)]
        tokens = list(tokens)
        self._check_stream(stream)
        # absorb a token that generate() emitted but did not yet feed back
        pending = self._pending.pop(stream, None)
        if pending is not None:
            tokens = [pending] + tokens
        if not tokens:
            raise ValueError("forward() needs at least one token")
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
                # full-chunk fast path: an exactly-bucket-sized chunk (every
                # non-final chunk of a long prompt) dispatches the unmasked
                # program — no ragged mask/carry selects (~15-20% faster on
                # chip; tools/prefill_overhead_probe.py)
                length = (None if len(chunk) == bucket
                          else jnp.asarray(len(chunk), jnp.int32))
                logits, state = self._jit_prefill(
                    self.params,
                    jnp.asarray(padded),
                    state,
                    length=length,
                )
        self.set_state(state, stream)
        self._last_logits[stream] = logits
        return logits[..., : self._true_vocab]

    def load_context(
        self,
        text: str,
        progress: bool | Callable[[float], None] = False,
        stream: int = 0,
    ) -> int:
        """Tokenize + ingest a prompt; returns the last token id
        (reference rwkv.h:395-413).

        progress: a callable receives the ingested fraction (0, 1] after
        each prefill chunk; True prints percent to stderr like the
        reference's loadContext progress line (rwkv.h:405-409)."""
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        ids = self.tokenizer.encode(text)
        if not ids:
            return -1
        cb = progress if callable(progress) else None
        if cb is None and progress:
            import sys

            def cb(frac: float) -> None:
                end = "\n" if frac >= 1.0 else ""
                print(f"\rloading context: {frac:6.1%}", end=end,
                      file=sys.stderr, flush=True)

        if cb is None:
            self.forward(ids, Mode.GPT, stream=stream)
        else:
            K = self.prefill_buckets[-1]
            for i in range(0, len(ids), K):
                self.forward(ids[i:i + K], Mode.GPT, stream=stream)
                cb(min(i + K, len(ids)) / len(ids))
        return ids[-1]

    loadContext = load_context

    # -- generation ----------------------------------------------------------------

    @staticmethod
    def _sample(logits, key, temp, tau, ban):
        key, sub = jax.random.split(key)
        logits = jnp.where(ban, -1e9, logits)
        return typical(sub, logits, temp=temp, tau=tau).astype(jnp.int32), key

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
        first_token: Optional[int] = None,
        chunk: int = 1,
    ) -> str:
        """Prompt-and-generate with typical sampling (the reference apps' loop,
        examples/terminalchat/chat.cpp:75-88, minus the per-token D2H).

        first_token: when continuing from a restored state with no new prompt,
        the token that produced that state's last update (so decoding resumes
        exactly where the snapshot left off).

        chunk: decode this many tokens per device dispatch (one lax.scan).
        chunk=1 reproduces the reference's token-at-a-time loop exactly;
        chunk=N amortizes per-dispatch latency N-fold (token streams are
        bit-identical — same key-split order) at two costs: on_text fires
        per chunk, and a stop string hit mid-chunk leaves the stream state
        advanced up to chunk-1 tokens past it (fine for stateless serving;
        keep chunk=1 when continuing conversations across stop strings)."""
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        self._require_loaded()
        if max_tokens <= 0:
            if prompt:
                self.load_context(prompt, stream=stream)
            return ""

        key = jax.random.PRNGKey(seed)
        # Ban mask at the PADDED vocab width: all sampling below runs on the
        # internal (padded) logits; only the public forward() return is
        # sliced to the true vocab.
        ban = np.zeros((self.config.vocab_size,), bool)
        for t in ban_tokens:
            ban[t] = True
        ban = jnp.asarray(ban)
        tempf, tauf = jnp.float32(temp), jnp.float32(tau)

        # Obtain logits for the first new token WITHOUT re-processing the
        # last prompt token (a reference quirk we fix: its decode loop
        # forwards `lasttoken` again after loadContext already ingested it).
        if prompt:
            self.forward(self.tokenizer.encode(prompt), stream=stream)
        elif stream in self._last_logits and self._pending.get(stream) is None:
            pass
        else:
            seed_tok = self._pending.pop(stream, None)
            if seed_tok is None:
                seed_tok = first_token if first_token is not None else 0
            self.forward(int(seed_tok), stream=stream)
        logits = self._last_logits[stream]  # padded width, matches `ban`

        token, key = self._jit_sample(logits, key, tempf, tauf, ban)
        state = self.get_state(stream)

        from rwkv_tpu.utils.text import StopScanner

        decoder = StreamDecoder(self.tokenizer)
        pieces: list[str] = []
        n_ids = 1  # token ids decoded (first one just sampled)
        # windowed stop-string scan (O(len(piece)) per token; shared with
        # the pool — utils/text.py)
        scanner = StopScanner(stop)

        def feed(piece: str) -> None:
            if not piece:
                return
            pieces.append(piece)
            if on_text:
                on_text(piece)
            scanner.feed(piece)

        feed(decoder.feed([int(token)]))

        remaining = max_tokens - 1
        while remaining > 0 and scanner.cut is None:
            # tail chunks stay chunked: a 7-token tail under chunk=8 is ONE
            # k=7 program (one extra jit cache entry), not 7 dispatches
            k = min(chunk, remaining)
            if k > 1:
                toks, state, key = self._jit_decode_chunk(
                    self.params, token, state, key, tempf, tauf, ban, k=k,
                )
                ids = np.asarray(toks).tolist()
                token = toks[-1]
            else:
                token, state, key = self._jit_decode(
                    self.params, token, state, key, tempf, tauf, ban,
                )
                ids = [int(token)]
            remaining -= len(ids)
            n_ids += len(ids)
            for tid in ids:
                feed(decoder.feed([int(tid)]))

        if scanner.cut is not None:
            text = "".join(pieces)[:scanner.cut]
        else:
            text = "".join(pieces) + decoder.flush()

        self.set_state(state, stream)
        self._pending[stream] = int(token)  # emitted, not yet absorbed

        from rwkv_tpu.utils.metrics import metrics

        metrics.inc("engine.generate_calls")
        metrics.inc("engine.tokens_generated", n_ids)
        return text
