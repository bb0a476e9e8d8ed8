"""Dependency-free ASGI inference app — the same HTTP contract as the
FastAPI app (serve/app.py) and the stdlib server (serve/httpd.py), as a
plain ASGI callable.

Why a third surface: fastapi is an optional extra; this module gives any
ASGI server (uvicorn, hypercorn, daphne) the full contract with zero
dependencies beyond the library itself, and — unlike the FastAPI wiring —
it is executable (and executed, tests/test_asgi.py) in minimal
environments.  Routes (reference contract: inference_api/app.py:51-75,
plus this framework's extensions):

  GET  /health   -> {"status": "ok"}
  POST /infer    -> mu/logvar/regime_probs (+ modes smoothed/filtered/
                    viterbi with exogenous u)
  POST /predict  -> portfolio weights (the working version of the
                    reference's broken Flask /predict, api.py:18)
  POST /stream   -> streaming filtered-posterior sessions (one frame per
                    request; models/online.py)
  GET  /metrics  -> Prometheus text exposition (serve/metrics.py)

Run: uvicorn 'vqvaehmm_tpu.serve.asgi:create_asgi_app()'
"""

from __future__ import annotations

import asyncio
import json
import os
import time

# MAX_BODY is shared across all three surfaces: a hostile or buggy
# client must not be able to balloon worker memory with an unbounded body
from .app import MAX_BODY as _MAX_BODY
from .app import get_model, reload_gate
from .batching import ServerBusy
from .metrics import CONTENT_TYPE as _METRICS_CT
from .metrics import METRICS


class _BodyTooLarge(Exception):
    pass


async def _read_body(receive) -> bytes:
    body = b""
    while True:
        msg = await receive()
        body += msg.get("body", b"")
        if len(body) > _MAX_BODY:
            raise _BodyTooLarge(f"request body exceeds {_MAX_BODY} bytes")
        if not msg.get("more_body"):
            return body


async def _respond(send, status: int, payload: dict) -> None:
    data = json.dumps(payload).encode()
    headers = [(b"content-type", b"application/json"),
               (b"content-length", str(len(data)).encode())]
    if status == 503:  # shed load: same backoff hint as the FastAPI twin
        headers.append((b"retry-after", b"1"))
    await send({
        "type": "http.response.start",
        "status": status,
        "headers": headers,
    })
    await send({"type": "http.response.body", "body": data})


def create_asgi_app(config_path: str = "inference_config.json"):
    """Build the ASGI callable (model loads lazily on first request —
    unless VQHMM_BATCH is set, in which case it loads and warms its
    executable ladder eagerly so no live request pays a compile)."""
    if os.environ.get("VQHMM_BATCH", "") not in ("", "0"):
        try:
            get_model(config_path)
        except Exception:
            # missing/incomplete config at import time: fall back to lazy
            # init so `import vqvaehmm_tpu.serve.asgi` never crashes; the
            # first request surfaces the real error as a 500
            pass

    async def app(scope, receive, send):
        if scope["type"] == "lifespan":  # uvicorn startup/shutdown chatter
            while True:
                msg = await receive()
                if msg["type"] == "lifespan.startup":
                    await send({"type": "lifespan.startup.complete"})
                elif msg["type"] == "lifespan.shutdown":
                    await send({"type": "lifespan.shutdown.complete"})
                    return
            return
        assert scope["type"] == "http"
        path, method = scope["path"], scope["method"]

        if path == "/metrics" and method == "GET":
            # the scrape itself is not recorded (same convention as the
            # other two surfaces)
            data = METRICS.render().encode()
            await send({
                "type": "http.response.start",
                "status": 200,
                "headers": [(b"content-type", _METRICS_CT.encode()),
                            (b"content-length", str(len(data)).encode())],
            })
            await send({"type": "http.response.body", "body": data})
            return

        t0 = time.perf_counter()

        async def respond(status: int, payload: dict) -> None:
            METRICS.observe_request(path, status,
                                    time.perf_counter() - t0)
            await _respond(send, status, payload)

        if path == "/health" and method == "GET":
            await respond(200, {"status": "ok"})
            return
        if path == "/admin/reload" and method == "POST":
            # checkpoint hot-swap; opt-in + token (app.reload_gate).
            # Gate BEFORE reading the body: an unauthenticated client
            # must not be able to make the worker buffer MAX_BODY —
            # denial is a cheap header-only response
            hdrs = {k.decode("latin-1").lower(): v.decode("latin-1")
                    for k, v in scope.get("headers", [])}
            denied = reload_gate(hdrs.get("x-reload-token"))
            if denied:
                await respond(denied[0], {"error": denied[1]["detail"]})
                return
            try:
                await _read_body(receive)  # drain (no body expected)
            except _BodyTooLarge as e:  # a client error, not a failed
                await respond(413, {"error": str(e)})  # reload
                return
            try:
                # off the event loop: a rebuild compiles executables
                # (minutes through a TPU compile relay) and must not
                # freeze /health and the other routes meanwhile
                out = await asyncio.to_thread(
                    lambda: get_model(config_path).reload())
                await respond(200, out)
            except Exception as e:  # old model keeps serving
                await respond(500, {"error": f"reload failed: {e}"})
            return
        if path in ("/infer", "/predict", "/stream") and method == "POST":
            try:
                req = json.loads((await _read_body(receive)) or b"{}")
                model = get_model(config_path)
                if path == "/stream":
                    out = model.stream(
                        req.get("session"), x_t=req.get("x_t"),
                        u_t=req.get("u_t"),
                        finish=bool(req.get("finish", False)),
                        state=req.get("state"),
                        carry_state=bool(req.get("carry_state", False)))
                    await respond(200, out)
                    return
                if "x" not in req:
                    raise ValueError("missing field 'x'")
                if path == "/infer":
                    out = model.infer(req["x"], u=req.get("u"),
                                      mode=req.get("mode", "mean_field"))
                else:
                    out = model.predict(req["x"])
                await respond(200, out)
            except _BodyTooLarge as e:
                await respond(413, {"error": str(e)})
            except ServerBusy as e:  # shed load: queue at max_queue
                await respond(503, {"error": str(e)})
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                # TypeError covers malformed payloads numpy rejects
                # (e.g. x as a JSON object) — still the client's fault
                await respond(400, {"error": str(e)})
            except Exception as e:  # parity with the reference's 500
                await respond(500, {"error": str(e)})
            return
        await respond(404, {"error": f"no route {method} {path}"})

    return app


# module-level app for `uvicorn vqvaehmm_tpu.serve.asgi:app`
app = create_asgi_app(os.environ.get("VQHMM_INFERENCE_CONFIG",
                                     "inference_config.json"))
