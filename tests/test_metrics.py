"""Observability registry: counters, timers, snapshot shape, thread safety."""

import json
import threading

from rwkv_tpu.utils.metrics import Metrics


def test_counters_and_timers():
    m = Metrics()
    m.inc("a")
    m.inc("a", 2.5)
    with m.timed("t"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["a"] == 3.5
    t = snap["timings"]["t"]
    assert t["count"] == 1 and t["max"] >= 0 and t["p50"] >= 0
    json.loads(m.dump())  # dump is valid json
    m.reset()
    assert m.snapshot() == {"counters": {}, "timings": {}}


def test_thread_safety_under_contention():
    m = Metrics()

    def work():
        for _ in range(500):
            m.inc("hits")
            m.observe("lat", 0.001)

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    snap = m.snapshot()
    assert snap["counters"]["hits"] == 4000
    assert snap["timings"]["lat"]["count"] == 4000


def test_timing_buffer_bounded():
    m = Metrics()
    for _ in range(10_000):
        m.observe("x", 0.0)
    # internal buffer halves above 4096: never grows unboundedly
    assert m.snapshot()["timings"]["x"]["count"] <= 4096


def test_engine_and_pool_feed_the_registry():
    from rwkv_tpu.utils.metrics import metrics as global_metrics

    import jax

    from rwkv_tpu.models.config import RWKVConfig
    from rwkv_tpu.models.rwkv4 import init_params, quantize_params
    from rwkv_tpu.runtime.engine import RWKV

    global_metrics.reset()
    eng = RWKV()
    eng.load_params(quantize_params(
        init_params(jax.random.PRNGKey(0), RWKVConfig.tiny_test(2, 32, 97))))

    class Tok:  # minimal tokenizer stub for generate()
        vocab_size = 97

        def encode(self, s):
            return [1, 2]

        def decode_bytes(self, ids):
            return b"x"

        def decode(self, ids):
            return "x"

    eng.tokenizer = Tok()
    eng.generate("hi", max_tokens=3, seed=0)
    snap = global_metrics.snapshot()
    assert snap["counters"]["engine.generate_calls"] >= 1
    assert snap["counters"]["engine.tokens_generated"] >= 1
