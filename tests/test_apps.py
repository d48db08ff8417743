"""App-level smoke tests (mock model + reference vocab fixture)."""

import json
import os
import threading
import urllib.request

import pytest

VOCAB_DIR = "/root/reference/include/rwkv/tokenizer/vocab"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(VOCAB_DIR), reason="reference vocab not available"
)


def _args(extra=()):
    return ["--mock", "--vocab", VOCAB_DIR, *extra]


def test_storygen_runs(capsys):
    from rwkv_tpu.apps.storygen import main

    main(_args(["--stories", "2", "--max-tokens", "6"]))
    out = capsys.readouterr().out
    assert "=== story 1 ===" in out and "=== story 2 ===" in out


def test_vectordb_ranks(capsys):
    from rwkv_tpu.apps.vectordb import main

    main(_args(["--query", "capital city of France", "--metric", "cosine"]))
    out = capsys.readouterr().out
    assert "query:" in out
    # 5 facts indexed, top-3 printed
    assert len([l for l in out.splitlines() if l.startswith("  ")]) == 3


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.server import make_handler

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    lock = threading.Lock()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng, lock))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, json.dumps(obj).encode(), {"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_health(server):
    with urllib.request.urlopen(server + "/health") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["model"]["vocab"] == 50277


def test_server_complete(server):
    code, body = _post(server, "/complete", {"prompt": "Hello", "max_tokens": 5})
    assert code == 200
    assert "completion" in body


def test_server_tokenize_roundtrip(server):
    code, body = _post(server, "/tokenize", {"text": "Hello world"})
    assert code == 200
    code, body2 = _post(server, "/detokenize", {"ids": body["ids"]})
    assert body2["text"] == "Hello world"


def test_server_bad_requests(server):
    assert _post(server, "/complete", {})[0] == 400
    assert _post(server, "/nope", {})[0] == 404
    code, _ = _post(server, "/tokenize", {"nope": 1})
    assert code == 400


def test_server_body_size_cap(server):
    """An attacker-sized Content-Length is rejected with 413 BEFORE the
    handler buffers (or even receives) the body — the body-size sibling
    of the pool's backpressure. Raw socket: the declared length alone
    must trigger the rejection, no body bytes sent."""
    import socket
    from urllib.parse import urlparse

    from rwkv_tpu.apps.server import MAX_BODY_BYTES

    u = urlparse(server)
    with socket.create_connection((u.hostname, u.port), timeout=10) as s:
        s.sendall(
            b"POST /tokenize HTTP/1.1\r\n"
            + f"Host: {u.hostname}\r\n".encode()
            + b"Content-Type: application/json\r\n"
            + f"Content-Length: {MAX_BODY_BYTES + 1024}\r\n".encode()
            + b"\r\n"  # headers done; never send the body
        )
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = s.recv(4096)
            if not chunk:
                break
            resp += chunk
    status = resp.split(b"\r\n", 1)[0]
    assert b"413" in status, resp[:200]
    # a normal-size request still works
    assert _post(server, "/tokenize", {"text": "hello"})[0] == 200


@pytest.fixture(scope="module")
def pooled_server():
    from http.server import ThreadingHTTPServer

    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.server import PoolRunner, make_handler
    from rwkv_tpu.runtime.pool import InferencePool

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    pool = InferencePool(eng.params, eng.tokenizer, max_streams=2,
                         prefill_bucket=16, step_fn=eng._step_fn)
    runner = PoolRunner(pool)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(eng, threading.Lock(), runner)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_pooled_server_concurrent_completions(pooled_server):
    """4 concurrent requests through 2 pool slots all complete."""
    results = {}

    def hit(i):
        code, body = _post(pooled_server, "/complete",
                           {"prompt": f"Request {i}", "max_tokens": 4,
                            "seed": i})
        results[i] = (code, body)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    for code, body in results.values():
        assert code == 200
        assert "completion" in body


def test_server_streaming_complete(server):
    """stream:true returns SSE lines ending with [DONE]."""
    req = urllib.request.Request(
        server + "/complete",
        json.dumps({"prompt": "Hello", "max_tokens": 4,
                    "stream": True}).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "text/event-stream"
        body = r.read().decode()
    lines = [l for l in body.splitlines() if l.startswith("data: ")]
    assert lines[-1] == "data: [DONE]"
    # every other line is a JSON text piece
    for l in lines[:-1]:
        assert "text" in json.loads(l[len("data: "):])


def test_pooled_server_streaming(pooled_server):
    req = urllib.request.Request(
        pooled_server + "/complete",
        json.dumps({"prompt": "Hi", "max_tokens": 3,
                    "stream": True}).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        body = r.read().decode()
    assert "data: [DONE]" in body


def test_vectordb_batch_index_matches_sequential(capsys):
    """Batched prefill indexing ranks like one-at-a-time indexing."""
    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.vectordb import FACTS, StateVectorDB

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    seq = StateVectorDB(eng, metric="cosine")
    for f in FACTS[:3]:
        seq.add(f)
    bat = StateVectorDB(eng, metric="cosine")
    bat.add_batch(FACTS[:3])
    q = "capital city of France"
    assert [t for t, _ in seq.query(q, 3)] == [t for t, _ in bat.query(q, 3)]


def test_storygen_sharded_cli(capsys):
    """--shards N builds a TP-sharded engine behind the same CLI; bundled
    vocab means no --vocab needed."""
    import rwkv_tpu.apps.storygen as sg

    sg.main(["--mock", "--stories", "1", "--max-tokens", "5", "--shards", "2"])
    out = capsys.readouterr().out
    assert out.strip()


def test_server_ban_tokens_validation(server):
    """/complete rejects malformed ban lists (incl. JSON booleans — bool is
    an int subclass) and accepts a real one."""
    code, _ = _post(server, "/complete",
                    {"prompt": "Hi", "max_tokens": 2, "ban_tokens": [True]})
    assert code == 400
    code, _ = _post(server, "/complete",
                    {"prompt": "Hi", "max_tokens": 2, "ban_tokens": [-3]})
    assert code == 400
    code, body = _post(server, "/complete",
                       {"prompt": "Hi", "max_tokens": 2, "ban_tokens": [0, 5]})
    assert code == 200 and "completion" in body


def test_server_metrics_endpoint(server):
    """/metrics exposes the process metrics registry; token counters move
    after a completion."""
    _post(server, "/complete", {"prompt": "Hi", "max_tokens": 3})
    with urllib.request.urlopen(server + "/metrics") as r:
        body = json.loads(r.read())
    assert "counters" in body and "timings" in body
    assert body["counters"].get("engine.tokens_generated", 0) >= 1


def test_pooled_server_metrics_occupancy(pooled_server):
    """Pool mode adds live occupancy (slots/active/queued) to /metrics."""
    _post(pooled_server, "/complete", {"prompt": "Hi", "max_tokens": 2})
    with urllib.request.urlopen(pooled_server + "/metrics") as r:
        body = json.loads(r.read())
    pool = body.get("pool")
    assert pool is not None
    assert pool["slots"] >= 1 and pool["active"] >= 0 and pool["queued"] >= 0
    assert body["counters"].get("pool.requests_completed", 0) >= 1


@pytest.fixture()
def tight_pooled_server():
    """Pooled server with a 1-deep admission queue: floods must be
    rejected with 503, not absorbed into unbounded threads."""
    from http.server import ThreadingHTTPServer

    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.server import PoolRunner, make_handler
    from rwkv_tpu.runtime.pool import InferencePool

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    pool = InferencePool(eng.params, eng.tokenizer, max_streams=2,
                         prefill_bucket=16, step_fn=eng._step_fn)
    runner = PoolRunner(pool, max_queue=1)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(eng, threading.Lock(), runner)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", runner
    srv.shutdown()


def test_pooled_server_backpressure(tight_pooled_server):
    """A burst of 4x-slot concurrent clients: every response is either a
    completion (200) or a clean 503 with Retry-After; at least one 503
    fires (2 slots + 1 queue < 8 clients); afterwards the server still
    serves (rejection never poisons the pool)."""
    url, runner = tight_pooled_server
    results = {}

    def hit(i):
        req = urllib.request.Request(
            url + "/complete",
            json.dumps({"prompt": f"Flood {i}", "max_tokens": 24,
                        "seed": i}).encode(),
            {"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                results[i] = (r.status, json.loads(r.read()), dict(r.headers))
        except urllib.error.HTTPError as e:
            results[i] = (e.code, json.loads(e.read()), dict(e.headers))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 8
    codes = [c for c, _, _ in results.values()]
    assert all(c in (200, 503) for c in codes), codes
    assert 503 in codes, codes  # 2 slots + 1 queue slot < 8 clients
    for c, body, hdrs in results.values():
        if c == 503:
            assert hdrs.get("Retry-After") == "1"
            assert "error" in body
        else:
            assert "completion" in body
    # the pool is healthy after the flood
    code, body = _post(url, "/complete", {"prompt": "After", "max_tokens": 3})
    assert code == 200 and "completion" in body


def test_pool_runner_submit_timeout():
    """submit_timeout: a request that cannot finish in time raises
    PoolTimeout (503 path) and, if still queued, is cancelled; the runner
    keeps serving afterwards."""
    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.server import PoolRunner, PoolTimeout
    from rwkv_tpu.runtime.pool import InferencePool

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    pool = InferencePool(eng.params, eng.tokenizer, max_streams=2,
                         prefill_bucket=16, step_fn=eng._step_fn)
    runner = PoolRunner(pool, submit_timeout=0.02)
    with pytest.raises(PoolTimeout):
        runner.submit("too slow", max_tokens=16, seed=0)
    # a patient runner on the same pool still completes
    runner.submit_timeout = 300.0
    out = runner.submit("recovers", max_tokens=3, seed=1)
    assert isinstance(out, str)


def test_pool_runner_drain(pooled_runner_setup=None):
    """drain(): in-flight requests finish, then new submits are refused."""
    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.server import PoolBusy, PoolRunner
    from rwkv_tpu.runtime.pool import InferencePool

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    pool = InferencePool(eng.params, eng.tokenizer, max_streams=2,
                         prefill_bucket=16, step_fn=eng._step_fn)
    runner = PoolRunner(pool)
    results = {}

    def hit(i):
        results[i] = runner.submit(f"Drain test {i}", max_tokens=3, seed=i)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    # drain cuts off NEW submissions — wait until all 3 are enqueued
    # (in _events) or already finished (in results) before draining
    import time as _time

    deadline = _time.time() + 60
    while _time.time() < deadline:
        with runner._lock:
            if len(runner._events) + len(results) >= 3:
                break
        _time.sleep(0.02)
    assert runner.drain(timeout=120), "pool did not empty"
    for t in threads:
        t.join(timeout=10)
    assert len(results) == 3
    assert all(isinstance(v, str) for v in results.values())
    with pytest.raises(PoolBusy, match="draining"):
        runner.submit("too late", max_tokens=2)


def test_pool_runner_would_block_during_drain():
    """Draining runner reports would_block() so the streaming endpoint
    refuses with a clean 503 instead of 200 + SSE error payload."""
    from rwkv_tpu.apps._common import build_engine
    from rwkv_tpu.apps.server import PoolRunner
    from rwkv_tpu.runtime.pool import InferencePool

    class A:
        mock, model, vocab, streams = True, None, VOCAB_DIR, 1
        temp, tau, seed = 0.9, 0.8, 0

    eng = build_engine(A)
    pool = InferencePool(eng.params, eng.tokenizer, max_streams=2,
                         prefill_bucket=16, step_fn=eng._step_fn)
    runner = PoolRunner(pool)
    assert runner.would_block() is False
    assert runner.drain(timeout=30)
    assert runner.would_block() is True
