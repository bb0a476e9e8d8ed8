"""Dependency-free HTTP server with the same contract as serve/app.py.

The production path is the FastAPI app (uvicorn/gunicorn, matching the
reference's entrypoint.sh:11); this stdlib fallback serves the identical
/health and /infer contract when fastapi is unavailable (as in minimal
images), and is what the contract tests exercise.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .app import MAX_BODY as _MAX_BODY  # shared across all 3 surfaces
from .app import get_model, reload_gate
from .batching import ServerBusy
from .metrics import CONTENT_TYPE as _METRICS_CT
from .metrics import METRICS


def _make_handler(model):  # InferenceModel or BatchingModel (same surface)
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            try:
                # allow_nan=False: emitting bare NaN/Infinity tokens is
                # not valid JSON and strict clients reject the 200 body
                # (the FastAPI surface errors on the same values)
                body = json.dumps(payload, allow_nan=False).encode()
            except ValueError:
                code = 500
                body = json.dumps(
                    {"detail": "non-finite values in response"}).encode()
            METRICS.observe_request(self.path, code,
                                    time.perf_counter() - self._t0)
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if code == 503:  # same backoff hint as the FastAPI twin
                self.send_header("Retry-After", "1")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._t0 = time.perf_counter()
            if self.path == "/metrics":
                # the scrape itself is not recorded (same convention as
                # the FastAPI middleware)
                body = METRICS.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", _METRICS_CT)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"detail": "not found"})

        def do_POST(self):
            self._t0 = time.perf_counter()
            if self.path not in ("/infer", "/predict", "/stream",
                                 "/admin/reload"):
                self._send(404, {"detail": "not found"})
                return
            try:
                if "chunked" in (self.headers.get("Transfer-Encoding")
                                 or "").lower():
                    self._send(411, {"detail": "Content-Length required"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if not 0 <= length <= _MAX_BODY:
                    # a negative or absurd length would otherwise block
                    # this handler thread on an unbounded/stalled read
                    self._send(400, {"detail": "bad Content-Length"})
                    return
                body = self.rfile.read(length)  # always drained: replying
                # with bytes left in the receive queue risks a RST that
                # discards the response before the client reads it
                if self.path == "/admin/reload":
                    # checkpoint hot-swap; opt-in + token (app.reload_gate)
                    # — model.reload() reaches the ModelHandle whether
                    # model IS the handle or a BatchingModel wrapping it
                    denied = reload_gate(self.headers.get("X-Reload-Token"))
                    if denied:
                        self._send(*denied)
                    else:
                        try:
                            self._send(200, model.reload())
                        except Exception as e:  # old model keeps serving
                            self._send(500,
                                       {"detail": f"reload failed: {e}"})
                    return
                req = json.loads(body or b"{}")
                if not isinstance(req, dict):
                    self._send(400, {"detail": "body must be a JSON "
                                               "object"})
                    return
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
            except ServerBusy as e:  # shed load: queue at max_queue
                self._send(503, {"detail": str(e)})
            except (ValueError, TypeError) as e:
                # TypeError covers malformed payloads (e.g. {"x": {...}})
                # — a client error, mapped to 400 exactly as serve/asgi
                # does; leaving it in the broad handler returned 500
                self._send(400, {"detail": str(e)})
            except Exception as e:  # noqa: BLE001 (parity: reference 500s)
                self._send(500, {"detail": str(e)})

        def log_message(self, *args):  # quiet
            pass

    return Handler


def serve(config_path: str = "inference_config.json", host: str = "0.0.0.0",
          port: int = 8000, background: bool = False, batch: bool = False,
          max_batch: int = 16, max_wait_ms: float = 2.0,
          warmup_lengths=(200,), max_queue: Optional[int] = None,
          pipeline_depth: int = 2,
          ) -> Optional[ThreadingHTTPServer]:
    """batch=True coalesces concurrent /infer requests into single device
    calls (serve/batching.py) — the TPU-native serving shape under load.
    warmup_lengths: sequence lengths whose executables are compiled
    BEFORE serving starts (no live request pays a compile); pass your
    deployment's expected lengths, or () to skip.  If VQHMM_BATCH
    already wrapped the model, its env-tuned max_batch/max_wait stand,
    but warmup_lengths given here are still warmed.

    background=True returns the server; the served model is reachable as
    `server.vqhmm_model` so callers can close() its batcher (the
    dispatcher thread and pool would otherwise outlive shutdown()).
    NOTE: that model is the process-wide get_model handle — close() at
    teardown retires batching for every surface in this process until
    the next serve(batch=True) or /admin/reload rebuilds it."""
    model = get_model(config_path)
    # batch=True configures batching ON the handle (not a local wrapper)
    # so a /admin/reload rebuilds + re-warms the batcher instead of
    # silently downgrading to solo dispatches.  configure_batching also
    # applies the flags to an already-(env-)batched handle and rebuilds
    # one a previous server teardown close()d.
    if batch:
        model.configure_batching(max_batch=max_batch,
                                 max_wait_ms=max_wait_ms,
                                 warmup_lengths=warmup_lengths,
                                 max_queue=max_queue,
                                 pipeline_depth=pipeline_depth)
    elif warmup_lengths and getattr(model, "is_batching", False):
        # the VQHMM_BATCH-wrapped case: the env default only warms its
        # own VQHMM_WARMUP_LENGTHS
        model.warmup(warmup_lengths)
    httpd = ThreadingHTTPServer((host, port), _make_handler(model))
    httpd.vqhmm_model = model
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    # graceful SIGTERM (k8s pod eviction sends it, then waits
    # terminationGracePeriodSeconds): stop accepting, let in-flight
    # handler threads finish (server_close joins them), drain the
    # batcher, exit 0 — instead of the default action killing requests
    # mid-write.  shutdown() must run off the serve_forever thread.
    import signal as _signal
    import sys as _sys

    def _graceful(signum, frame):
        print("SIGTERM: draining and shutting down", file=_sys.stderr,
              flush=True)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    # ThreadingHTTPServer defaults daemon_threads=True, under which
    # server_close() joins NOTHING (socketserver._Threads.append skips
    # daemon threads) — the interpreter would still kill handlers
    # mid-write at exit.  Non-daemon handlers are actually joined.
    httpd.daemon_threads = False
    try:
        prev = _signal.signal(_signal.SIGTERM, _graceful)
    except ValueError:  # not the main thread: default behaviour stands
        prev = None
    try:
        httpd.serve_forever()
    finally:
        if prev is not None:
            _signal.signal(_signal.SIGTERM, prev)
        httpd.server_close()  # joins in-flight handler threads
        if getattr(model, "is_batching", False):
            model.close(drain=True)
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
    p.add_argument("--max-queue", type=int, default=None,
                   help="shed load (503) beyond this many queued "
                        "requests; default unbounded")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="batched device calls kept in flight (dispatch "
                        "i+1 overlaps dispatch i's compute); default 2")
    a = p.parse_args()
    # the banner prints from serve() only after the model is loaded and
    # the port is bound — announcing "serving" before either is a lie
    print(f"starting on {a.host}:{a.port}"
          + (f" (micro-batching <= {a.max_batch})" if a.batch else "")
          + " ...", flush=True)
    serve(a.config, a.host, a.port, batch=a.batch, max_batch=a.max_batch,
          max_wait_ms=a.max_wait_ms, max_queue=a.max_queue,
          pipeline_depth=a.pipeline_depth)
