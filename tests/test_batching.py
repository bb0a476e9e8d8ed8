"""Dynamic micro-batching (serve/batching.py): concurrent requests coalesce
into single device calls, bit-identical to the solo path.

The reference serves one request per forward (inference_api/app.py:56-75);
batching is the TPU-native serving upgrade.
"""

import concurrent.futures
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("batching")
    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                  "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
        "checkpoint_path": str(tmp / "nonexistent"),
    }
    cfg_path = tmp / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from vqvaehmm_tpu.serve.app import InferenceModel

    return InferenceModel(str(cfg_path))


def _batcher(model, **kw):
    from vqvaehmm_tpu.serve.batching import BatchingModel

    return BatchingModel(model, **kw)


def test_batched_equals_solo_bitexact(model):
    """A row served out of a coalesced batch must equal the solo result
    bit-for-bit (zero padding + per-sequence ops; no cross-batch mixing)."""
    b = _batcher(model, max_batch=8, max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(0)
        xs = [rng.normal(size=(5, T)).tolist() for T in (17, 23, 29, 31)]
        solo = [model.infer(x) for x in xs]

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            batched = list(ex.map(b.infer, xs))
        for s, r in zip(solo, batched):
            for key in ("mu", "logvar", "regime_probs"):
                np.testing.assert_array_equal(np.array(s[key]),
                                              np.array(r[key]))
    finally:
        b.close()


def test_burst_coalesces_into_fewer_dispatches(model):
    """16 concurrent same-bucket requests must need far fewer device calls
    than requests (the entire point of micro-batching)."""
    b = _batcher(model, max_batch=16, max_wait_ms=50.0)
    try:
        rng = np.random.default_rng(1)
        x = rng.normal(size=(5, 20)).tolist()
        with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
            results = list(ex.map(lambda _: b.infer(x), range(16)))
        assert b.requests == 16
        assert b.dispatches <= 8, (b.dispatches, b.requests)
        ref = model.infer(x)
        for r in results:
            np.testing.assert_array_equal(np.array(r["regime_probs"]),
                                          np.array(ref["regime_probs"]))
    finally:
        b.close()


def test_mixed_buckets_group_separately(model):
    """Requests in different padding buckets never share a dispatch but all
    still return correct per-request results."""
    b = _batcher(model, max_batch=8, max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(2)
        xs = [rng.normal(size=(5, T)).tolist() for T in (10, 50, 12, 60)]
        solo = [model.infer(x) for x in xs]
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            batched = list(ex.map(b.infer, xs))
        for s, r in zip(solo, batched):
            np.testing.assert_array_equal(np.array(s["regime_probs"]),
                                          np.array(r["regime_probs"]))
    finally:
        b.close()


def test_bad_request_raises_without_wedging(model):
    """Shape validation errors surface to the caller; the dispatcher keeps
    serving afterwards."""
    b = _batcher(model, max_batch=4, max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError):
            b.infer([[1.0, 2.0]])  # C=1, not 5
        x = np.random.default_rng(3).normal(size=(5, 15)).tolist()
        out = b.infer(x)
        assert np.array(out["regime_probs"]).shape == (3, 15)
    finally:
        b.close()


def test_non_mean_field_modes_pass_through(model):
    """smoothed/viterbi/predict are exact-inference paths and bypass the
    batcher unchanged."""
    b = _batcher(model, max_batch=4, max_wait_ms=5.0)
    try:
        rng = np.random.default_rng(4)
        x = rng.normal(size=(5, 18)).tolist()
        u = rng.normal(size=(4, 18)).tolist()
        out = b.infer(x, u=u, mode="smoothed")
        assert out["mode"] == "smoothed"
        ref = model.infer(x, u=u, mode="smoothed")
        np.testing.assert_array_equal(np.array(out["regime_probs"]),
                                      np.array(ref["regime_probs"]))
        w = b.predict(x)
        np.testing.assert_allclose(np.array(w["weights"]).sum(), 1.0,
                                   atol=1e-4)
    finally:
        b.close()


def test_httpd_serves_with_batching(model, tmp_path):
    """The stdlib server runs end-to-end with batching enabled."""
    import socket
    import urllib.request

    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                  "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
        "checkpoint_path": str(tmp_path / "nonexistent"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from vqvaehmm_tpu.serve.httpd import serve

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(str(cfg_path), host="127.0.0.1", port=port,
                  background=True, batch=True, max_wait_ms=10.0)
    try:
        x = np.random.default_rng(5).normal(size=(5, 21)).tolist()

        def hit(_):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer",
                data=json.dumps({"x": x}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(hit, range(8)))
        q0 = np.array(results[0][1]["regime_probs"])
        for status, out in results:
            assert status == 200
            np.testing.assert_array_equal(np.array(out["regime_probs"]), q0)
    finally:
        httpd.shutdown()


def test_close_rejects_and_drains(model):
    """After close(), queued work is failed (not hung) and new requests
    are rejected."""
    from vqvaehmm_tpu.serve.batching import BatchingModel

    b = BatchingModel(model, max_batch=4, max_wait_ms=5.0)
    b.close()
    with pytest.raises(RuntimeError):
        b.infer(np.zeros((5, 10)).tolist())


def test_warmup_covers_non_power_of_two_max_batch(model):
    """max_batch=10 can dispatch pad_b=16 (next ladder rung); warmup must
    compile that shape too."""
    from vqvaehmm_tpu.serve.batching import BatchingModel

    b = BatchingModel(model, max_batch=10, max_wait_ms=1.0)
    seen = []
    orig = model._infer

    def spy(x, lengths, use_pallas=None):
        seen.append(tuple(x.shape))
        return orig(x, lengths, use_pallas)

    model._infer = spy
    try:
        b.warmup([20])  # bucket 32
        assert any(s[0] == 16 for s in seen), seen
    finally:
        model._infer = orig
        b.close()


def test_env_knob_batches_all_surfaces(tmp_path, monkeypatch):
    """VQHMM_BATCH=1 makes get_model return the micro-batcher so the
    FastAPI/ASGI/stdlib servers all coalesce without code changes."""
    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                  "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
        "checkpoint_path": str(tmp_path / "nonexistent"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from vqvaehmm_tpu.serve.app import get_model
    from vqvaehmm_tpu.serve.batching import BatchingModel

    monkeypatch.setenv("VQHMM_BATCH", "1")
    monkeypatch.setenv("VQHMM_WARMUP_LENGTHS", "")  # keep the test fast
    get_model.cache_clear()
    try:
        m = get_model(str(cfg_path))
        # get_model returns a ModelHandle proxy (hot-reload); is_batching
        # delegates to the wrapped micro-batcher
        assert m.is_batching and isinstance(m._inner, BatchingModel)
        x = np.random.default_rng(7).normal(size=(5, 13)).tolist()
        out = m.infer(x)
        assert np.array(out["regime_probs"]).shape == (3, 13)
    finally:
        m.close()
        get_model.cache_clear()


def test_warmup_covers_solo_and_exact_paths(model):
    """warmup() must also compile the scalar-valid_to solo executable
    (predict()/passthrough) and the exact-inference jits, so no live
    request pays a first compile (round-2 advisor finding)."""
    from vqvaehmm_tpu.serve.batching import BatchingModel

    b = BatchingModel(model, max_batch=4, max_wait_ms=1.0)
    seen = {"scalar": 0, "vector": 0, "exact": 0}
    orig_infer = model._infer
    orig_sm, orig_fi, orig_vi = (model._smoothed, model._filtered,
                                 model._viterbi)

    def spy_infer(x, lengths, use_pallas=None):
        if getattr(lengths, "ndim", 0) == 0 or isinstance(lengths, int):
            seen["scalar"] += 1
        else:
            seen["vector"] += 1
        return orig_infer(x, lengths, use_pallas)

    def spy_exact(orig):
        def f(x, u, lens):
            seen["exact"] += 1
            return orig(x, u, lens)
        return f

    model._infer = spy_infer
    model._smoothed = spy_exact(orig_sm)
    model._filtered = spy_exact(orig_fi)
    model._viterbi = spy_exact(orig_vi)
    try:
        b.warmup([20])
        assert seen["scalar"] >= 1, seen
        assert seen["vector"] >= 1, seen
        assert seen["exact"] == 3, seen
    finally:
        model._infer = orig_infer
        model._smoothed, model._filtered, model._viterbi = (orig_sm,
                                                            orig_fi,
                                                            orig_vi)
        b.close()


def test_batching_model_is_true_drop_in(model):
    """BatchingModel proxies everything it does not override (cfg,
    params, checkpoint_loaded, ...) — the gradio surface reads m.cfg /
    m.params off get_model()'s return, which is a BatchingModel under
    VQHMM_BATCH (review finding: it crashed with AttributeError)."""
    bm = _batcher(model)
    try:
        assert bm.cfg is model.cfg
        assert bm.params is model.params
        assert bm.checkpoint_loaded == model.checkpoint_loaded
        # the exact attribute accesses the gradio callback makes
        # (gradio_app.make_infer_fn: m.cfg.*, m.model.posterior(m.params))
        import jax.numpy as jnp
        import numpy as np

        x = jnp.asarray(np.zeros((1, bm.cfg.model.input_dim, 32),
                                 np.float32))
        q = bm.model.posterior(bm.params, x)
        assert q.shape[1] == bm.cfg.model.K
    finally:
        bm.close()


def test_infer_after_close_raises(model):
    bm = _batcher(model)
    bm.close()
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="shut down"):
        bm.infer([[0.0] * 32 for _ in range(model.cfg.model.input_dim)])


def test_max_queue_sheds_load(model):
    """Backpressure: requests beyond max_queue raise ServerBusy instead
    of joining an unbounded backlog; the queue serving normally again
    accepts new work."""
    import threading

    from vqvaehmm_tpu.serve.batching import ServerBusy

    x = [[0.0] * 16 for _ in range(model.cfg.model.input_dim)]
    # long linger so the first request is still queued when the second
    # arrives (nothing dispatches inside the window)
    bm = _batcher(model, max_batch=8, max_wait_ms=500.0, max_queue=1)
    try:
        bm.infer(x)  # compile + prove max_queue=1 admits solo requests
        t = threading.Thread(target=bm.infer, args=(x,))
        t.start()
        for _ in range(1000):  # wait until it is actually queued
            with bm._lock:
                if bm._queue:
                    break
            import time

            time.sleep(0.001)
        with pytest.raises(ServerBusy, match="queue full"):
            bm.infer(x)
        t.join(timeout=30)
        assert not t.is_alive()
        bm.infer(x)  # drained queue admits requests again
    finally:
        bm.close()


def test_max_queue_maps_to_503_over_http(tmp_path, monkeypatch):
    """The stdlib server maps ServerBusy to 503 (max_queue=0 sheds every
    request deterministically)."""
    import socket
    import urllib.error
    import urllib.request

    from vqvaehmm_tpu.serve.app import get_model
    from vqvaehmm_tpu.serve.httpd import serve

    cfg = {"model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                     "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8}}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    get_model.cache_clear()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(str(cfg_path), host="127.0.0.1", port=port,
                  background=True, batch=True, warmup_lengths=(),
                  max_queue=0)
    try:
        x = [[0.0] * 16 for _ in range(5)]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer",
            data=json.dumps({"x": x}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 503
    finally:
        httpd.shutdown()
        httpd.vqhmm_model.close()
        get_model.cache_clear()


def test_high_rtt_startup_warning(model, monkeypatch, capsys):
    """With the warn threshold forced to 0 ms any real dispatch RTT
    trips the co-location warning (round-3 VERDICT item 8: batching
    behind a high-RTT device link measured ~3x slower than per-request
    dispatch — say so at startup, not in production graphs)."""
    monkeypatch.setenv("VQHMM_RTT_WARN_MS", "0")
    b = _batcher(model, max_batch=4, max_wait_ms=1.0)
    try:
        err = capsys.readouterr().err
        assert "does not look co-located" in err
    finally:
        b.close()
    # at the default 5 ms threshold a local CPU dispatch must NOT warn
    monkeypatch.delenv("VQHMM_RTT_WARN_MS")
    b2 = _batcher(model, max_batch=4, max_wait_ms=1.0)
    try:
        assert "co-located" not in capsys.readouterr().err
    finally:
        b2.close()


def test_pipeline_depth_plumbed(model, monkeypatch):
    """--pipeline-depth / VQHMM_PIPELINE_DEPTH reach the dispatcher's
    pool (surfaced as a tunable, round-3 VERDICT item 8)."""
    b = _batcher(model, max_batch=4, max_wait_ms=1.0, pipeline_depth=3)
    try:
        assert b._pool._max_workers == 3
    finally:
        b.close()
    from vqvaehmm_tpu.serve.app import _env_batch_opts

    monkeypatch.setenv("VQHMM_BATCH", "1")
    monkeypatch.setenv("VQHMM_PIPELINE_DEPTH", "4")
    assert _env_batch_opts()["pipeline_depth"] == 4
