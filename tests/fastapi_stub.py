"""Minimal fastapi test double: just enough API surface for
serve/app.create_app to execute its full wiring (routing decorators, the
http middleware chain, pydantic request-model binding, HTTPException
mapping, Response passthrough) without the real library — pydantic
itself IS real (installed in the dev image), so request validation runs
the genuine validators.  Semantics mirrored from FastAPI where they are
observable to serve/app.py: pydantic validation failure -> 422, raised
HTTPException -> {"detail": ...} JSON with its status/headers, dict
return -> JSON 200, unknown route -> 404 {"detail": "Not Found"}.

Real-fastapi coverage still exists: CI installs the `serve` extra and
tests/test_asgi.py::test_fastapi_app_builds_and_serves runs against the
real library there (reference contract: inference_api/app.py:51-75).
"""

from __future__ import annotations

import asyncio
import inspect
import json
import sys
import types

import pydantic


class HTTPException(Exception):
    def __init__(self, status_code, detail=None, headers=None):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail
        self.headers = dict(headers or {})


class Response:
    def __init__(self, content=b"", status_code=200, media_type=None,
                 headers=None):
        self.body = content.encode() if isinstance(content, str) else content
        self.status_code = status_code
        self.media_type = media_type
        self.headers = dict(headers or {})
        if media_type:
            self.headers["content-type"] = media_type


class _URL:
    def __init__(self, path):
        self.path = path


class Request:
    def __init__(self, method, path, headers=None, body=b""):
        self.method = method
        self.url = _URL(path)
        self.headers = {k.lower(): v for k, v in dict(headers or {}).items()}
        self._body = body


def _json_response(payload, status_code=200, headers=None):
    return Response(json.dumps(payload), status_code,
                    media_type="application/json", headers=headers)


class FastAPI:
    __stub__ = True

    def __init__(self, title=None, **_kw):
        self.title = title
        self.routes = {}
        self.middlewares = []

    def get(self, path):
        return self._route("GET", path)

    def post(self, path):
        return self._route("POST", path)

    def _route(self, method, path):
        def deco(fn):
            self.routes[(method, path)] = fn
            return fn

        return deco

    def middleware(self, kind):
        assert kind == "http", kind

        def deco(fn):
            self.middlewares.append(fn)
            return fn

        return deco

    # -- request dispatch (what TestClient drives) ----------------------

    async def _endpoint(self, request):
        fn = self.routes.get((request.method, request.url.path))
        if fn is None:
            return _json_response({"detail": "Not Found"}, 404)
        try:
            kwargs = {}
            for name, par in inspect.signature(fn).parameters.items():
                ann = par.annotation
                if isinstance(ann, str):
                    # postponed annotations: resolve the way the real
                    # fastapi does — against fn.__globals__ (closure
                    # locals are intentionally NOT consulted; a name
                    # that only exists in the closure fails under the
                    # real library too, so the stub must fail the same
                    # way rather than mask it)
                    ann = eval(ann, dict(fn.__globals__))  # noqa: S307
                if ann is Request:
                    kwargs[name] = request
                elif isinstance(ann, type) and issubclass(
                        ann, pydantic.BaseModel):
                    try:
                        payload = json.loads(request._body or b"null")
                    except json.JSONDecodeError:
                        return _json_response(
                            {"detail": "JSON decode error"}, 422)
                    if not isinstance(payload, dict):
                        return _json_response(
                            {"detail": "body must be an object"}, 422)
                    try:
                        kwargs[name] = ann(**payload)
                    except pydantic.ValidationError as e:
                        return _json_response(
                            {"detail": json.loads(e.json())}, 422)
            out = fn(**kwargs)
            if inspect.isawaitable(out):
                out = await out
            if isinstance(out, Response):
                return out
            return _json_response(out)
        except HTTPException as e:
            return _json_response({"detail": e.detail}, e.status_code,
                                  headers=e.headers)

    async def _dispatch(self, request):
        call = self._endpoint
        for mw in reversed(self.middlewares):
            def wrap(mw=mw, nxt=call):
                async def layer(req):
                    return await mw(req, nxt)

                return layer

            call = wrap()
        return await call(request)


class _ClientResponse:
    def __init__(self, resp):
        self.status_code = resp.status_code
        self.headers = resp.headers
        body = resp.body
        self._body = body if isinstance(body, bytes) else str(body).encode()

    @property
    def text(self):
        return self._body.decode()

    def json(self):
        return json.loads(self._body)


class TestClient:
    __test__ = False  # keep pytest from collecting this as a test class

    def __init__(self, app):
        self.app = app

    def _request(self, method, path, json_body=None, headers=None):
        body = (json.dumps(json_body).encode()
                if json_body is not None else b"")
        hdrs = dict(headers or {})
        if json_body is not None:
            hdrs.setdefault("content-length", str(len(body)))
            hdrs.setdefault("content-type", "application/json")
        req = Request(method, path, hdrs, body)
        return _ClientResponse(asyncio.run(self.app._dispatch(req)))

    def get(self, path, **kw):
        return self._request("GET", path, **kw)

    def post(self, path, json=None, **kw):
        return self._request("POST", path, json_body=json, **kw)


def install_stub():
    """Install the stub as `fastapi` (+ `fastapi.testclient`) in
    sys.modules; no-op returning the real module when fastapi is
    genuinely installed."""
    if "fastapi" in sys.modules:
        return sys.modules["fastapi"]
    try:
        import fastapi  # noqa: F401

        return sys.modules["fastapi"]
    except ImportError:
        pass
    mod = types.ModuleType("fastapi")
    mod.__stub__ = True
    mod.FastAPI = FastAPI
    mod.HTTPException = HTTPException
    mod.Request = Request
    mod.Response = Response
    tc = types.ModuleType("fastapi.testclient")
    tc.__stub__ = True
    tc.TestClient = TestClient
    mod.testclient = tc
    sys.modules["fastapi"] = mod
    sys.modules["fastapi.testclient"] = tc
    return mod


def uninstall_stub():
    for name in ("fastapi", "fastapi.testclient"):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__stub__", False):
            del sys.modules[name]
