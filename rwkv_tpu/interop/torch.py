"""PyTorch interop: torch-tensor API over the TPU engine.

Parity with the reference's pytorch binding (bindings/pytorch/
torch_binding.py: RwkvCppWrapper + attachState) — there, Python passes state
functionally by swapping the engine's CPU state pointers for torch storage
(torchbind.cpp:7-26). Here state is already functional, so the wrapper just
converts at the boundary: logits and state come back as torch tensors, state
goes in as torch tensors.

torch is an optional dependency; import of this module requires it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import torch

import jax.numpy as jnp

from rwkv_tpu.models.rwkv4 import WKVState, forward_step, init_state
from rwkv_tpu.runtime.engine import RWKV


def _to_torch(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x))


def _state_to_torch(state: WKVState) -> list[torch.Tensor]:
    return [_to_torch(s) for s in state]


def _state_from_torch(tensors: Sequence[torch.Tensor]) -> WKVState:
    return WKVState(*(jnp.asarray(t.detach().cpu().numpy()) for t in tensors))


class TorchRWKV:
    """The reference RwkvCppWrapper shape: forward(token, state) -> (logits,
    state), everything torch tensors, state passed explicitly."""

    def __init__(self, model_path: Optional[str] = None, params=None):
        self._eng = RWKV()
        if params is not None:
            self._eng.load_params(params)
        elif model_path:
            self._eng.load_file(model_path)
        else:
            raise ValueError("need model_path or params")

    @property
    def n_layer(self) -> int:
        return self._eng.config.n_layer

    @property
    def n_embd(self) -> int:
        return self._eng.config.n_embd

    def empty_state(self) -> list[torch.Tensor]:
        """[xy, aa, bb, pp, dd], each [L, E] float32 (reference order)."""
        return _state_to_torch(init_state(self._eng.config))

    def forward(
        self, token: int | torch.Tensor, state: Sequence[torch.Tensor]
    ) -> Tuple[torch.Tensor, list[torch.Tensor]]:
        tok = int(token) if not isinstance(token, torch.Tensor) else int(token.item())
        logits, new_state = self._eng._jit_step(
            self._eng.params, jnp.asarray(tok, jnp.int32), _state_from_torch(state)
        )
        return _to_torch(logits).clone(), _state_to_torch(new_state)

    def forward_batch(
        self, tokens: torch.Tensor, state: Sequence[torch.Tensor]
    ) -> Tuple[torch.Tensor, list[torch.Tensor]]:
        """tokens [B] int, state leaves [L, B, E]."""
        logits, new_state = forward_step(
            self._eng.params,
            jnp.asarray(tokens.detach().cpu().numpy().astype(np.int32)),
            _state_from_torch(state),
        )
        return _to_torch(logits).clone(), _state_to_torch(new_state)
