"""Dependency-free HTTP server with the same contract as serve/app.py.

The production path is the FastAPI app (uvicorn/gunicorn, matching the
reference's entrypoint.sh:11); this stdlib fallback serves the identical
/health and /infer contract when fastapi is unavailable (as in minimal
images), and is what the contract tests exercise.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .app import get_model


def _make_handler(model):  # InferenceModel or BatchingModel (same surface)
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"detail": "not found"})

        def do_POST(self):
            if self.path not in ("/infer", "/predict", "/stream"):
                self._send(404, {"detail": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/stream":
                    self._send(200, model.stream(
                        req.get("session"), x_t=req.get("x_t"),
                        u_t=req.get("u_t"),
                        finish=bool(req.get("finish", False)),
                        state=req.get("state"),
                        carry_state=bool(req.get("carry_state", False))))
                    return
                if "x" not in req:
                    self._send(400, {"detail": "missing field 'x'"})
                    return
                if self.path == "/infer":
                    self._send(200, model.infer(
                        req["x"], u=req.get("u"),
                        mode=req.get("mode", "mean_field")))
                else:
                    self._send(200, model.predict(req["x"]))
            except ValueError as e:
                self._send(400, {"detail": str(e)})
            except Exception as e:  # noqa: BLE001 (parity: reference 500s)
                self._send(500, {"detail": str(e)})

        def log_message(self, *args):  # quiet
            pass

    return Handler


def serve(config_path: str = "inference_config.json", host: str = "0.0.0.0",
          port: int = 8000, background: bool = False, batch: bool = False,
          max_batch: int = 16, max_wait_ms: float = 2.0,
          warmup_lengths=(200,)) -> Optional[ThreadingHTTPServer]:
    """batch=True coalesces concurrent /infer requests into single device
    calls (serve/batching.py) — the TPU-native serving shape under load.
    warmup_lengths: sequence lengths whose batch-ladder executables are
    compiled BEFORE serving starts (no live request pays a compile); pass
    your deployment's expected lengths, or () to skip."""
    model = get_model(config_path)
    from .batching import BatchingModel

    if batch and not isinstance(model, BatchingModel):
        # get_model may already have wrapped it (VQHMM_BATCH env)
        model = BatchingModel(model, max_batch=max_batch,
                              max_wait_ms=max_wait_ms)
        if warmup_lengths:
            model.warmup(warmup_lengths)
    httpd = ThreadingHTTPServer((host, port), _make_handler(model))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()
    return None


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="inference_config.json")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch", action="store_true",
                   help="micro-batch concurrent /infer requests")
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    a = p.parse_args()
    print(f"serving on {a.host}:{a.port}"
          + (f" (micro-batching <= {a.max_batch})" if a.batch else ""))
    serve(a.config, a.host, a.port, batch=a.batch, max_batch=a.max_batch,
          max_wait_ms=a.max_wait_ms)
