"""Session state save/resume across engine instances."""

import os

import jax
import numpy as np
import pytest

from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import init_params, quantize_params
from rwkv_tpu.runtime.engine import RWKV

VOCAB_DIR = "/root/reference/include/rwkv/tokenizer/vocab"


@pytest.fixture(scope="module")
def params():
    return quantize_params(
        init_params(jax.random.PRNGKey(8), RWKVConfig(n_layer=2, n_embd=16))
    )


def test_state_roundtrip_same_logits(tmp_path, params):
    eng = RWKV()
    eng.load_params(params)
    eng.forward([4, 5, 6])
    path = str(tmp_path / "sess.npz")
    eng.save_state(path)
    l_a = np.asarray(eng.forward(9))

    eng2 = RWKV()
    eng2.load_params(params)
    eng2.load_state(path)
    l_b = np.asarray(eng2.forward(9))
    np.testing.assert_array_equal(l_a, l_b)


@pytest.mark.skipif(not os.path.isdir(VOCAB_DIR), reason="vocab unavailable")
def test_generate_resumes_identically(tmp_path, params):
    eng = RWKV()
    eng.load_params(params)
    eng.load_tokenizer(VOCAB_DIR)
    eng.generate("Hello there", max_tokens=4, seed=3)
    path = str(tmp_path / "sess.npz")
    eng.save_state(path)
    cont_a = eng.generate("", max_tokens=4, seed=5)

    eng2 = RWKV()
    eng2.load_params(params)
    eng2.load_tokenizer(VOCAB_DIR)
    eng2.load_state(path)
    cont_b = eng2.generate("", max_tokens=4, seed=5)
    assert cont_a == cont_b


def test_metrics_counters(params):
    from rwkv_tpu.utils.metrics import metrics

    metrics.reset()
    with metrics.timed("test.op"):
        pass
    metrics.inc("test.count", 3)
    snap = metrics.snapshot()
    assert snap["counters"]["test.count"] == 3
    assert snap["timings"]["test.op"]["count"] == 1
