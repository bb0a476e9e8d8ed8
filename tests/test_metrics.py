"""Serving observability: the dependency-free /metrics surface.

The reference defers observability entirely ("Prometheus if desired",
deploy/README.md:27-29, nothing implemented — SURVEY.md section 5); this
framework exposes the Prometheus text format from all three serving
surfaces via serve/metrics.py.  Unit tests cover the registry's
exposition format; the integration tests drive GET /metrics over a real
socket (stdlib server) and through the ASGI callable.

The registry is process-global and other test files also serve requests,
so integration assertions read DELTAS between two scrapes, never
absolute counts.
"""

import json
import re
import socket
import urllib.error
import urllib.request

import numpy as np
import pytest

from vqvaehmm_tpu.serve.metrics import (BATCH_BUCKETS, REQUEST_BUCKETS,
                                        MetricsRegistry,
                                        normalize_endpoint)


# ---------------------------------------------------------------- registry

def _parse(text):
    """exposition text -> {series_with_labels: float}, HELP/TYPE dropped."""
    out = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        name, val = line.rsplit(" ", 1)
        out[name] = float(val)
    return out


def test_counter_and_histogram_exposition():
    reg = MetricsRegistry()
    reg.observe_request("/infer", 200, 0.003)
    reg.observe_request("/infer", 200, 0.3)
    reg.observe_request("/infer", 400, 0.0005)
    reg.observe_request("/nope/../scan", 404, 0.001)  # -> "other"
    s = _parse(reg.render())
    assert s['vqhmm_requests_total{endpoint="/infer",status="200"}'] == 2
    assert s['vqhmm_requests_total{endpoint="/infer",status="400"}'] == 1
    assert s['vqhmm_requests_total{endpoint="other",status="404"}'] == 1
    # histogram buckets are CUMULATIVE: 0.0005 and 0.003 both fall under
    # le=0.005; all three under +Inf
    assert s['vqhmm_request_seconds_bucket{endpoint="/infer",'
             'le="0.005"}'] == 2
    assert s['vqhmm_request_seconds_bucket{endpoint="/infer",'
             'le="+Inf"}'] == 3
    assert s['vqhmm_request_seconds_count{endpoint="/infer"}'] == 3
    assert s['vqhmm_request_seconds_sum{endpoint="/infer"}'] == \
        pytest.approx(0.3035)
    # bucket monotonicity across the whole ladder
    vals = [s[f'vqhmm_request_seconds_bucket{{endpoint="/infer",'
             f'le="{int(b) if float(b).is_integer() else repr(b)}"}}']
            for b in REQUEST_BUCKETS]
    assert vals == sorted(vals)


def test_batch_histogram():
    reg = MetricsRegistry()
    for size in (1, 1, 4, 16):
        reg.observe_batch(size)
    s = _parse(reg.render())
    assert s['vqhmm_batch_size_bucket{le="1"}'] == 2
    assert s['vqhmm_batch_size_bucket{le="4"}'] == 3
    assert s['vqhmm_batch_size_bucket{le="+Inf"}'] == 4
    assert s['vqhmm_batch_size_sum'] == 22
    assert [float(b) for b in BATCH_BUCKETS] == sorted(BATCH_BUCKETS)


def test_gauges_live_and_fault_tolerant():
    reg = MetricsRegistry()
    box = {"v": 2}
    reg.register_gauge("vqhmm_stream_sessions", lambda: box["v"],
                       "Live sessions.")
    reg.register_gauge("vqhmm_broken", lambda: 1 / 0, "Always raises.")
    s1 = _parse(reg.render())
    assert s1["vqhmm_stream_sessions"] == 2
    assert "vqhmm_broken" not in s1  # a dying gauge must not kill scrapes
    box["v"] = 5  # read at scrape time, not at registration
    assert _parse(reg.render())["vqhmm_stream_sessions"] == 5
    # re-registration replaces the callback
    reg.register_gauge("vqhmm_stream_sessions", lambda: 0, "replaced")
    assert _parse(reg.render())["vqhmm_stream_sessions"] == 0


def test_normalize_endpoint_bounds_cardinality():
    assert normalize_endpoint("/infer") == "/infer"
    assert normalize_endpoint("/admin/" + "A" * 500) == "other"


def test_render_is_valid_exposition_shape():
    reg = MetricsRegistry()
    reg.observe_request("/health", 200, 0.001)
    text = reg.render()
    assert text.endswith("\n")
    # every sample line: name{labels}? value
    for line in text.splitlines():
        if line.startswith("#") or not line:
            continue
        assert re.fullmatch(
            r'[a-zA-Z_][a-zA-Z0-9_]*(\{[^{}]*\})? -?[0-9.e+infINF-]+',
            line), line


# ------------------------------------------------------------ integration

@pytest.fixture(scope="module")
def server_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("metrics_serve")
    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                  "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
    }
    cfg_path = tmp / "inference_config.json"
    cfg_path.write_text(json.dumps(cfg))

    from vqvaehmm_tpu.serve.httpd import serve

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(str(cfg_path), host="127.0.0.1", port=port,
                  background=True)
    yield f"http://127.0.0.1:{port}", str(cfg_path)
    httpd.shutdown()


@pytest.fixture(scope="module")
def server(server_cfg):
    return server_cfg[0]


def _scrape(base):
    with urllib.request.urlopen(base + "/metrics") as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/plain")
        return _parse(resp.read().decode())


def test_httpd_metrics_counts_requests(server):
    before = _scrape(server)

    x = np.random.default_rng(0).normal(size=(5, 16)).tolist()
    req = urllib.request.Request(
        server + "/infer", data=json.dumps({"x": x}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
    with urllib.request.urlopen(server + "/health") as resp:
        assert resp.status == 200

    after = _scrape(server)
    k200 = 'vqhmm_requests_total{endpoint="/infer",status="200"}'
    khealth = 'vqhmm_requests_total{endpoint="/health",status="200"}'
    assert after[k200] - before.get(k200, 0) == 1
    assert after[khealth] - before.get(khealth, 0) == 1
    kcnt = 'vqhmm_request_seconds_count{endpoint="/infer"}'
    ksum = 'vqhmm_request_seconds_sum{endpoint="/infer"}'
    assert after[kcnt] - before.get(kcnt, 0) == 1
    assert after[ksum] > before.get(ksum, 0)
    # gauges from the loaded model are exposed
    assert after["vqhmm_checkpoint_loaded"] == 0  # no checkpoint configured
    assert after["vqhmm_stream_sessions"] >= 0


def test_httpd_metrics_counts_client_errors(server):
    before = _scrape(server)
    req = urllib.request.Request(
        server + "/infer", data=json.dumps({"x": [[1.0]]}).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    after = _scrape(server)
    k = 'vqhmm_requests_total{endpoint="/infer",status="400"}'
    assert after[k] - before.get(k, 0) == 1
    # scrapes themselves are never recorded: the two GET /metrics calls
    # bracketing this test must not move any endpoint="other" series
    other = {key for key in set(before) | set(after)
             if 'endpoint="other"' in key}
    for key in other:
        assert after.get(key, 0) == before.get(key, 0)


def test_asgi_metrics_route():
    """GET /metrics through the ASGI callable returns the exposition."""
    import asyncio

    from vqvaehmm_tpu.serve.asgi import create_asgi_app

    app = create_asgi_app("inference_config.json")  # lazy: never loads

    async def drive(path, method="GET"):
        sent = []

        async def receive():
            return {"type": "http.request", "body": b"", "more_body": False}

        async def send(msg):
            sent.append(msg)

        await app({"type": "http", "path": path, "method": method},
                  receive, send)
        return sent

    sent = asyncio.run(drive("/metrics"))
    assert sent[0]["status"] == 200
    ctype = dict(sent[0]["headers"])[b"content-type"].decode()
    assert ctype.startswith("text/plain")
    body = sent[1]["body"].decode()
    assert "vqhmm_requests_total" in body
    assert "vqhmm_batch_size_bucket" in body

    # an unknown route is recorded under endpoint="other"
    before = _parse(body)
    asyncio.run(drive("/no-such-route"))
    after = _parse(asyncio.run(drive("/metrics"))[1]["body"].decode())
    k = 'vqhmm_requests_total{endpoint="other",status="404"}'
    assert after[k] - before.get(k, 0) == 1


def test_batcher_records_dispatch_sizes(server_cfg):
    """Micro-batched dispatches land in the vqhmm_batch_size histogram."""
    from vqvaehmm_tpu.serve.app import get_model
    from vqvaehmm_tpu.serve.batching import BatchingModel
    from vqvaehmm_tpu.serve.metrics import METRICS

    _, cfg_path = server_cfg
    before = _parse(METRICS.render())
    bm = BatchingModel(get_model(cfg_path), max_batch=4, max_wait_ms=1.0)
    try:
        x = np.random.default_rng(2).normal(size=(5, 16)).tolist()
        out = bm.infer(x)
        assert "regime_probs" in out
    finally:
        bm.close()
    after = _parse(METRICS.render())
    k = "vqhmm_batch_size_count"
    assert after[k] - before.get(k, 0) >= 1
