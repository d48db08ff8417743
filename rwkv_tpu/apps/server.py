"""HTTP completion server (reference: examples/pybind-flask/server.py's
/complete endpoint and the examples/httpserver C++ skeleton).

Stdlib-only (the reference ethos is dependency-free). Endpoints:

  POST /complete   {"prompt": str, "max_tokens": int?, "temp": float?,
                    "tau": float?, "stop": [str]?, "seed": int?}
                -> {"completion": str, "tokens": int}
  POST /tokenize   {"text": str} -> {"ids": [int]}
  POST /detokenize {"ids": [int]} -> {"text": str}
  GET  /health     -> {"status": "ok", "model": {...}}

Each /complete runs on a fresh state (stateless API, like the reference
flask server which rebuilds context per request).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from rwkv_tpu.apps._common import add_model_args, build_engine


def make_handler(eng, lock):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet
            print("[http]", fmt % a, file=sys.stderr)

        def do_GET(self):
            if self.path == "/health":
                cfg = eng.config
                self._json(200, {
                    "status": "ok",
                    "model": {"n_layer": cfg.n_layer, "n_embd": cfg.n_embd,
                              "vocab": cfg.vocab_size},
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._json(400, {"error": "bad json"})

            if self.path == "/tokenize":
                if "text" not in req:
                    return self._json(400, {"error": "missing 'text'"})
                return self._json(200, {"ids": eng.tokenizer.encode(req["text"])})

            if self.path == "/detokenize":
                if "ids" not in req:
                    return self._json(400, {"error": "missing 'ids'"})
                return self._json(200, {"text": eng.tokenizer.decode(req["ids"])})

            if self.path == "/complete":
                prompt = req.get("prompt")
                if not isinstance(prompt, str) or not prompt:
                    return self._json(400, {"error": "missing 'prompt'"})
                max_tokens = min(int(req.get("max_tokens", 128)), 2048)
                with lock:  # single model; serialize requests
                    eng.reset_state(0)
                    out = eng.generate(
                        prompt,
                        max_tokens=max_tokens,
                        temp=float(req.get("temp", 0.9)),
                        tau=float(req.get("tau", 0.8)),
                        seed=int(req.get("seed", 0)),
                        stop=req.get("stop"),
                    )
                return self._json(200, {"completion": out,
                                        "tokens": len(eng.tokenizer.encode(out))})

            self._json(404, {"error": "not found"})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(description="RWKV HTTP server (TPU)")
    add_model_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)

    eng = build_engine(args)
    lock = threading.Lock()
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(eng, lock))
    print(f"listening on http://{args.host}:{args.port}", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
