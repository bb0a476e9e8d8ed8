"""Zero-downtime checkpoint hot-reload (serve/app.ModelHandle).

The reference can only pick up new weights by restarting the server
process (inference_api/app.py loads once at import).  Here every serving
surface holds a ModelHandle; POST /admin/reload (opt-in via
VQHMM_ENABLE_RELOAD, optionally token-gated) builds a fresh validated
model from the re-read config and swaps it atomically — a failed build
leaves the old model serving.
"""

import json
import socket
import urllib.error
import urllib.request

import numpy as np
import pytest

CFG = {"model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                 "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8}}


def _write_ckpt(path, seed, hidden_dim=8):
    import jax

    from vqvaehmm_tpu.core.config import ModelConfig
    from vqvaehmm_tpu.data.checkpoint import save_params_npz
    from vqvaehmm_tpu.models.vae_hmm import VAEHMM

    cfg = dict(CFG["model"], hidden_dim=hidden_dim)
    model = VAEHMM(ModelConfig(**cfg))
    save_params_npz(str(path), model.init(jax.random.PRNGKey(seed)))


@pytest.fixture()
def handle(tmp_path):
    from vqvaehmm_tpu.serve.app import get_model

    ckpt = tmp_path / "weights.npz"
    _write_ckpt(ckpt, seed=0)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(dict(CFG, checkpoint_path=str(ckpt))))
    get_model.cache_clear()
    yield get_model(str(cfg_path)), ckpt
    get_model.cache_clear()


def test_reload_swaps_weights(handle):
    """After reload, the handle serves the NEW checkpoint's outputs —
    bit-identical to a model built fresh from it (fresh jits: params are
    trace constants, so an in-place param assignment would have kept
    serving the old executables)."""
    from vqvaehmm_tpu.serve.app import InferenceModel

    m, ckpt = handle
    x = np.random.default_rng(3).normal(size=(5, 21)).tolist()
    q_before = np.array(m.infer(x)["regime_probs"])

    _write_ckpt(ckpt, seed=1)
    info = m.reload()
    assert info == {"reloaded": True, "checkpoint_loaded": True,
                    "batching": False}

    q_after = np.array(m.infer(x)["regime_probs"])
    assert np.abs(q_after - q_before).max() > 1e-6  # weights changed
    fresh = InferenceModel(m._config_path)
    np.testing.assert_array_equal(
        q_after, np.array(fresh.infer(x)["regime_probs"]))


def test_failed_reload_keeps_old_model(handle):
    """A checkpoint that fails startup validation (wrong shapes) must
    raise WITHOUT swapping: the old weights keep serving."""
    m, ckpt = handle
    x = np.random.default_rng(4).normal(size=(5, 17)).tolist()
    q_before = np.array(m.infer(x)["regime_probs"])

    _write_ckpt(ckpt, seed=2, hidden_dim=16)  # template mismatch
    with pytest.raises(ValueError):
        m.reload()
    np.testing.assert_array_equal(
        np.array(m.infer(x)["regime_probs"]), q_before)


def test_reload_rebuilds_and_retires_batcher(handle, monkeypatch):
    """Under VQHMM_BATCH the reload builds a fresh micro-batcher and
    closes the old one (its dispatcher thread must not leak)."""
    m, ckpt = handle
    monkeypatch.setenv("VQHMM_BATCH", "1")
    monkeypatch.setenv("VQHMM_WARMUP_LENGTHS", "")  # keep the test fast
    info = m.reload()
    assert info["batching"] is True
    old = m._inner
    assert old._thread.is_alive()
    try:
        info = m.reload()  # second reload retires the first batcher
        assert info["batching"] is True
        old._thread.join(timeout=5)
        assert not old._thread.is_alive()
        x = np.random.default_rng(5).normal(size=(5, 9)).tolist()
        assert np.array(m.infer(x)["regime_probs"]).shape == (3, 9)
    finally:
        m._inner.close()


def test_carried_stream_state_survives_reload(handle):
    """Streaming sessions are worker-local and drop on reload (it is a
    logical worker restart) — but a carry_state client resumes exactly,
    the same contract that survives multi-worker fan-out."""
    m, _ = handle
    rng = np.random.default_rng(6)
    frames = [(rng.normal(size=5).tolist(), rng.normal(size=4).tolist())
              for _ in range(4)]
    out = None
    for x_t, u_t in frames[:2]:
        out = m.stream("s1", x_t=x_t, u_t=u_t, carry_state=True)
    state = out["state"]

    m.reload()
    resumed = m.stream("s1", x_t=frames[2][0], u_t=frames[2][1],
                       state=state, carry_state=True)
    assert resumed["resumed"] is True

    # oracle: one uninterrupted session over the same frames — the
    # post-reload update must settle the same columns bit-identically
    solo = None
    for x_t, u_t in frames[:3]:
        solo = m.stream("solo", x_t=x_t, u_t=u_t)
    assert [c["t"] for c in resumed["settled"]] \
        == [c["t"] for c in solo["settled"]]
    for a, b in zip(resumed["settled"], solo["settled"]):
        np.testing.assert_array_equal(a["regime_probs"],
                                      b["regime_probs"])


def test_failed_reload_restores_metrics_gauges(handle, monkeypatch):
    """A candidate model that fails AFTER construction (its __init__
    re-binds the /metrics gauges) must not leave the gauges pointing at
    the discarded candidate: the serving model re-binds them."""
    from vqvaehmm_tpu.serve.metrics import METRICS

    m, _ = handle
    rng = np.random.default_rng(8)
    m.stream("live", x_t=rng.normal(size=5).tolist(),
             u_t=rng.normal(size=4).tolist())  # serving model: 1 session

    # candidate InferenceModel builds fine, then the batcher warmup
    # config fails -> reload raises after the gauges were re-bound
    monkeypatch.setenv("VQHMM_BATCH", "1")
    monkeypatch.setenv("VQHMM_WARMUP_LENGTHS", "oops")
    with pytest.raises(ValueError):
        m.reload()
    assert "vqhmm_stream_sessions 1" in METRICS.render()


def test_reload_drains_queued_requests(handle, monkeypatch):
    """Requests already queued in the old micro-batcher when the swap
    happens must complete on the old model, not fail with 500s
    (BatchingModel.close(drain=True))."""
    import threading

    m, _ = handle
    monkeypatch.setenv("VQHMM_BATCH", "1")
    monkeypatch.setenv("VQHMM_WARMUP_LENGTHS", "")
    monkeypatch.setenv("VQHMM_MAX_WAIT_MS", "150")  # linger: queue holds
    m.reload()  # now batching, generous linger window
    x = np.random.default_rng(9).normal(size=(5, 11)).tolist()
    m.infer(x)  # compile outside the timed window

    import time

    results, errors = [], []
    old = m._inner
    base = old.requests

    def worker():
        try:
            results.append(old.infer(x))  # pin the OLD batcher
        except Exception as e:  # pragma: no cover - the failure mode
            errors.append(e)

    t = threading.Thread(target=worker)
    t.start()
    # wait until the request is actually queued in the old dispatcher
    for _ in range(1000):
        with old._lock:
            if old._queue or old.requests > base:
                break
        time.sleep(0.001)
    m.reload()  # swaps + close(drain=True) on the old batcher
    t.join(timeout=30)
    try:
        assert not errors, errors
        assert results and np.array(
            results[0]["regime_probs"]).shape == (3, 11)
    finally:
        m._inner.close()


def test_configure_batching_survives_reload(handle):
    """The --batch CLI path (configure_batching) must keep batching —
    warmed — across reloads instead of downgrading to solo dispatch."""
    m, _ = handle
    m.configure_batching(max_batch=4, max_wait_ms=1.0,
                         warmup_lengths=(32,))
    assert m.is_batching
    old = m._inner
    info = m.reload()
    try:
        assert info["batching"] is True
        assert m._inner is not old and m.is_batching
        old._thread.join(timeout=5)
        assert not old._thread.is_alive()  # old dispatcher retired
        x = np.random.default_rng(10).normal(size=(5, 8)).tolist()
        assert np.array(m.infer(x)["regime_probs"]).shape == (3, 8)
    finally:
        m._inner.close()


def _post(url, payload=None, headers=None):
    req = urllib.request.Request(
        url, data=json.dumps(payload or {}).encode(),
        headers={"Content-Type": "application/json", **(headers or {})})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_reload_gating_and_swap(tmp_path, monkeypatch):
    """Over a real socket: /admin/reload 404s unless enabled, 403s on a
    bad token, and with the right token swaps weights with the server
    up the whole time."""
    from vqvaehmm_tpu.serve.app import get_model
    from vqvaehmm_tpu.serve.httpd import serve

    ckpt = tmp_path / "weights.npz"
    _write_ckpt(ckpt, seed=0)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(dict(CFG, checkpoint_path=str(ckpt))))
    get_model.cache_clear()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(str(cfg_path), host="127.0.0.1", port=port,
                  background=True)
    base = f"http://127.0.0.1:{port}"
    try:
        x = np.random.default_rng(7).normal(size=(5, 13)).tolist()
        _, out1 = _post(base + "/infer", {"x": x})

        monkeypatch.delenv("VQHMM_ENABLE_RELOAD", raising=False)
        assert _post(base + "/admin/reload")[0] == 404  # hidden

        monkeypatch.setenv("VQHMM_ENABLE_RELOAD", "1")
        monkeypatch.setenv("VQHMM_RELOAD_TOKEN", "sesame")
        status, _ = _post(base + "/admin/reload",
                          headers={"X-Reload-Token": "wrong"})
        assert status == 403

        _write_ckpt(ckpt, seed=1)
        status, info = _post(base + "/admin/reload",
                             headers={"X-Reload-Token": "sesame"})
        assert status == 200 and info["reloaded"] is True

        _, out2 = _post(base + "/infer", {"x": x})
        assert np.abs(np.array(out2["regime_probs"])
                      - np.array(out1["regime_probs"])).max() > 1e-6
    finally:
        httpd.shutdown()
        get_model.cache_clear()


def test_asgi_reload_route(tmp_path, monkeypatch):
    """The dependency-free ASGI surface exposes the same gated route."""
    import asyncio

    from vqvaehmm_tpu.serve.app import get_model
    from vqvaehmm_tpu.serve.asgi import create_asgi_app

    ckpt = tmp_path / "weights.npz"
    _write_ckpt(ckpt, seed=0)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(dict(CFG, checkpoint_path=str(ckpt))))
    get_model.cache_clear()
    app = create_asgi_app(str(cfg_path))

    def call(path, headers=(), body=b"{}"):
        scope = {"type": "http", "method": "POST", "path": path,
                 "headers": list(headers)}
        sent = []

        async def receive():
            return {"type": "http.request", "body": body,
                    "more_body": False}

        async def send(msg):
            sent.append(msg)

        asyncio.run(app(scope, receive, send))
        status = sent[0]["status"]
        body = json.loads(sent[1]["body"])
        return status, body

    try:
        monkeypatch.delenv("VQHMM_ENABLE_RELOAD", raising=False)
        assert call("/admin/reload")[0] == 404
        monkeypatch.setenv("VQHMM_ENABLE_RELOAD", "1")
        _write_ckpt(ckpt, seed=1)
        status, info = call("/admin/reload")
        assert status == 200 and info["reloaded"] is True

        # an oversized body is the client's fault: 413, not a 500
        # "reload failed" alert (same mapping as the other routes)
        import vqvaehmm_tpu.serve.asgi as asgi_mod

        monkeypatch.setattr(asgi_mod, "_MAX_BODY", 8)
        status, body = call("/admin/reload", body=b"x" * 64)
        assert status == 413, (status, body)
    finally:
        get_model.cache_clear()


def test_configure_batching_applies_to_live_and_rebuilds_closed(handle,
                                                                monkeypatch):
    """configure_batching must (a) apply new dispatch settings to an
    already-live batcher (an env-batched handle given --batch flags must
    not silently keep its old max_queue), and (b) rebuild a batcher a
    previous server teardown close()d instead of wrapping or reusing the
    dead dispatcher."""
    m, _ = handle
    m.configure_batching(max_batch=4, max_wait_ms=1.0, warmup_lengths=(),
                         max_queue=None)
    live = m._inner
    m.configure_batching(max_batch=8, max_wait_ms=3.0, warmup_lengths=(),
                         max_queue=5)
    assert m._inner is live  # reconfigured in place, not rebuilt
    assert live.max_batch == 8 and live.max_queue == 5
    assert abs(live.max_wait_s - 0.003) < 1e-9

    live.close()  # the documented server-teardown path
    m.configure_batching(max_batch=2, max_wait_ms=1.0, warmup_lengths=())
    assert m._inner is not live and m.is_batching and not m._inner.stopped
    x = np.random.default_rng(11).normal(size=(5, 9)).tolist()
    try:
        assert np.array(m.infer(x)["regime_probs"]).shape == (3, 9)
    finally:
        m._inner.close()


def test_503_carries_retry_after_on_stdlib(tmp_path):
    """All surfaces shed load with the same backoff hint: the stdlib
    503 carries Retry-After like the FastAPI twin."""
    import socket as _socket

    from vqvaehmm_tpu.serve.app import get_model
    from vqvaehmm_tpu.serve.httpd import serve

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(CFG))
    get_model.cache_clear()
    with _socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(str(cfg_path), host="127.0.0.1", port=port,
                  background=True, batch=True, warmup_lengths=(),
                  max_queue=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer",
            data=json.dumps({"x": [[0.0] * 8 for _ in range(5)]}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 503
        assert exc.value.headers.get("Retry-After") == "1"
    finally:
        httpd.shutdown()
        httpd.vqhmm_model.close()
        get_model.cache_clear()
