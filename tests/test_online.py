"""Streaming online filter (models/online.py): incremental filtered
posteriors must equal the batch filtered_posterior column-for-column."""

import json

import jax
import numpy as np
import pytest

from vqvaehmm_tpu import make_model


@pytest.fixture(scope="module")
def setup():
    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    T = 23
    x = rng.normal(size=(5, T)).astype(np.float32)
    u = rng.normal(size=(4, T)).astype(np.float32)
    return model, params, x, u


def _batch_filtered(model, params, x, u, T=None):
    import jax.numpy as jnp

    T = x.shape[1] if T is None else T
    lengths = jnp.asarray(np.array([T], np.int32))
    q = model.filtered_posterior(params, jnp.asarray(x[None, :, :T]),
                                 jnp.asarray(u[None, :, :T]), lengths)
    return np.asarray(q)[0]  # (K, T)


def test_stream_matches_batch_filtered(setup):
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import OnlineFilter

    T = x.shape[1]
    batch = _batch_filtered(model, params, x, u)

    f = OnlineFilter(model, params)
    got = {}
    for t in range(T):
        for s, q in f.update(x[:, t], u[:, t]):
            got[s] = q
        # settled frames lag the stream by exactly 2
        assert max(got) == t - 2 if t >= 2 else not got
    for s, q in f.finish():
        got[s] = q
    assert sorted(got) == list(range(T))
    for s in range(T):
        np.testing.assert_allclose(got[s], batch[:, s], atol=1e-5,
                                   err_msg=f"column {s}")


def test_peek_matches_truncated_batch(setup):
    """peek after n frames == last column of the batch filtered posterior
    over exactly those n frames (zero right-context semantics)."""
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import OnlineFilter

    f = OnlineFilter(model, params)
    for n in range(1, 9):
        f.update(x[:, n - 1], u[:, n - 1])
        peek = f.peek()
        ref = _batch_filtered(model, params, x, u, T=n)[:, n - 1]
        np.testing.assert_allclose(peek, ref, atol=1e-5, err_msg=f"n={n}")


def test_short_streams_and_reset(setup):
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import OnlineFilter

    for T in (1, 2, 3):
        f = OnlineFilter(model, params)
        got = {}
        for t in range(T):
            got.update(dict(f.update(x[:, t], u[:, t])))
        got.update(dict(f.finish()))
        batch = _batch_filtered(model, params, x, u, T=T)
        assert sorted(got) == list(range(T))
        for s in range(T):
            np.testing.assert_allclose(got[s], batch[:, s], atol=1e-5)
        with pytest.raises(RuntimeError):
            f.update(x[:, 0], u[:, 0])
        f.reset()
        f.update(x[:, 0], u[:, 0])  # reusable after reset


def test_stream_manager_sessions(setup):
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import StreamManager

    mgr = StreamManager(model, params)
    # two interleaved sessions stay independent
    for t in range(6):
        a = mgr.update("a", x[:, t], u[:, t])
        b = mgr.update("b", x[:, 5 - t], u[:, 5 - t])
        assert "peek" in a and "peek" in b
    out_a = mgr.update("a", x[:, 6], u[:, 6], finish=True)
    ts = [d["t"] for d in out_a["settled"]]
    assert ts == [4, 5, 6]
    assert "a" not in mgr._sessions and "b" in mgr._sessions


def test_http_stream_endpoint(tmp_path):
    """End-to-end /stream over a real socket, and its settled columns match
    the batch filtered posterior."""
    import socket
    import urllib.request

    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                  "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
        "checkpoint_path": str(tmp_path / "nonexistent"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from vqvaehmm_tpu.serve.app import InferenceModel
    from vqvaehmm_tpu.serve.httpd import ThreadingHTTPServer, _make_handler

    model = InferenceModel(str(cfg_path))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(model))
    import threading

    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(3)
        T = 9
        x = rng.normal(size=(5, T)).astype(np.float32)
        u = rng.normal(size=(4, T)).astype(np.float32)

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/stream",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())

        got = {}
        for t in range(T):
            out = post({"session": "s1", "x_t": x[:, t].tolist(),
                        "u_t": u[:, t].tolist(),
                        "finish": t == T - 1})
            for d in out["settled"]:
                got[d["t"]] = np.array(d["regime_probs"])
            if t < T - 1:
                assert out["t_peek"] == t and len(out["peek"]) == 3
        batch = _batch_filtered(model.model, model.params, x, u)
        assert sorted(got) == list(range(T))
        for s_ in range(T):
            np.testing.assert_allclose(got[s_], batch[:, s_], atol=1e-5)
    finally:
        httpd.shutdown()


def test_frame_buffer_stays_bounded(setup):
    """Streams prune settled frames: memory is O(window), not O(T)."""
    model, params, _, _ = setup
    from vqvaehmm_tpu.models.online import OnlineFilter

    rng = np.random.default_rng(11)
    f = OnlineFilter(model, params)
    for t in range(60):
        f.update(rng.normal(size=5), rng.normal(size=4))
    assert len(f._x) <= OnlineFilter.W + 2, len(f._x)
    assert f.n_frames == 60


def test_sessions_share_one_step_fn_and_expire(setup):
    model, params, _, _ = setup
    import time

    from vqvaehmm_tpu.models.online import StreamManager

    rng = np.random.default_rng(13)
    mgr = StreamManager(model, params, ttl_seconds=300.0)
    mgr.update("a", rng.normal(size=5), rng.normal(size=4))
    mgr.update("b", rng.normal(size=5), rng.normal(size=4))
    assert mgr._sessions["a"]._step is mgr._sessions["b"]._step

    short = StreamManager(model, params, ttl_seconds=0.05)
    short.update("a", rng.normal(size=5), rng.normal(size=4))
    time.sleep(0.1)
    short.update("c", rng.normal(size=5), rng.normal(size=4))
    assert "a" not in short._sessions and "c" in short._sessions


def test_session_export_import_continues_identically(setup):
    """A session exported from one manager and imported into another
    continues the stream with identical settled outputs (worker hand-off
    for multi-process serving)."""
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import OnlineFilter, StreamManager

    T = x.shape[1]
    # uninterrupted reference
    ref = OnlineFilter(model, params)
    got_ref = {}
    for t in range(T):
        got_ref.update(dict(ref.update(x[:, t], u[:, t])))
    got_ref.update(dict(ref.finish()))

    a = StreamManager(model, params)
    for t in range(9):
        a.update("s", x[:, t], u[:, t])
    blob = a.export_session("s")
    assert "s" not in a._sessions
    import json as _json

    blob = _json.loads(_json.dumps(blob))  # must survive JSON transport

    b = StreamManager(model, params)
    b.import_session("s", blob)
    got = {}
    for t in range(9, T):
        out = b.update("s", x[:, t], u[:, t],
                       finish=t == T - 1)
        for d in out["settled"]:
            got[d["t"]] = np.array(d["regime_probs"])
    for s_ in got:
        np.testing.assert_allclose(got[s_], got_ref[s_], atol=1e-6,
                                   err_msg=f"column {s_}")
    assert max(got) == T - 1


def test_client_carried_state_across_workers(setup):
    """Multi-worker story with ZERO manual export/import: the client sets
    carry_state=true, echoes the returned state with each request, and
    alternates between two independent StreamManagers ("workers"); the
    settled columns must equal a single-worker run of the same stream."""
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import StreamManager

    T = x.shape[1]

    # single-worker reference run
    solo = StreamManager(model, params)
    ref_rows = []
    for t in range(T):
        out = solo.update("s", x[:, t], u[:, t], finish=(t == T - 1))
        ref_rows += out["settled"]

    # two workers, alternating per frame; nothing shared between them and
    # NO manual export/import — the stale local copy each worker retains
    # must be overridden by the client-carried state on every hit
    workers = [StreamManager(model, params), StreamManager(model, params)]
    rows, carried = [], None
    for t in range(T):
        w = workers[t % 2]
        out = w.update("s", x[:, t], u[:, t], finish=(t == T - 1),
                       state=carried, carry_state=True)
        rows += out["settled"]
        carried = out.get("state")
        if t > 0:
            assert out["resumed"] is True
            assert out["new_session"] is False

    assert [r["t"] for r in rows] == [r["t"] for r in ref_rows]
    for a, b in zip(rows, ref_rows):
        np.testing.assert_allclose(a["regime_probs"], b["regime_probs"],
                                   rtol=0, atol=0)

    # regression (review finding): a STALE local session must not shadow
    # the carried state — hit worker 0 twice in a row with an old local
    # copy present and a newer carried state
    wA, wB = StreamManager(model, params), StreamManager(model, params)
    o1 = wA.update("r", x[:, 0], u[:, 0], carry_state=True)
    o2 = wB.update("r", x[:, 1], u[:, 1], state=o1["state"],
                   carry_state=True)
    # wA still holds "r" at t=0; the carried state is at t=1
    o3 = wA.update("r", x[:, 2], u[:, 2], state=o2["state"],
                   carry_state=True)
    assert o3["resumed"] is True
    assert o3["t_peek"] == 2


def test_replacement_serializes_and_stale_finish_is_isolated(setup):
    """Two concurrency guarantees around carried-state replacement:
    (1) replacing a stale local session REUSES its per-session lock, so a
    replacement can never compute concurrently with an in-flight update
    on the old filter; (2) a finish() computed against a filter that was
    replaced mid-flight must not deregister the newer filter."""
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import StreamManager

    w = StreamManager(model, params)
    o1 = w.update("s", x[:, 0], u[:, 0], carry_state=True)
    lock_before = w._session_locks["s"]
    w.update("s", x[:, 1], u[:, 1], state=o1["state"], carry_state=True)
    assert w._session_locks["s"] is lock_before

    # stale finish: grab the current filter, replace the session, then
    # run the finish body against the stale filter — the newer
    # registration must survive
    stale = w._sessions["s"]
    o2 = w.update("s", x[:, 2], u[:, 2], state=o1["state"],
                  carry_state=True)
    newer = w._sessions["s"]
    assert newer is not stale
    w._update_locked(stale, "s", x[:, 3], u[:, 3], finish=True,
                     carry_state=False, new_session=False, resumed=False)
    assert w._sessions.get("s") is newer
    # and a real finish on the live filter still deregisters it
    w.update("s", None, None, finish=True)
    assert "s" not in w._sessions and "s" not in w._session_locks
    del o2


def test_new_session_flag(setup):
    """A fresh or expired session id must be flagged explicitly so clients
    detect resets instead of inferring them from t indices."""
    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import StreamManager

    m = StreamManager(model, params, ttl_seconds=0.0)  # instant expiry
    out1 = m.update("a", x[:, 0], u[:, 0])
    assert out1["new_session"] is True and out1["resumed"] is False
    import time

    time.sleep(0.01)
    # TTL expired: same id silently restarts -> flagged
    out2 = m.update("a", x[:, 1], u[:, 1])
    assert out2["new_session"] is True
    # with client-carried state the restart resumes instead
    m2 = StreamManager(model, params)
    o = m2.update("b", x[:, 0], u[:, 0], carry_state=True)
    assert o["new_session"] is True
    m3 = StreamManager(model, params)
    o2 = m3.update("b", x[:, 1], u[:, 1], state=o["state"])
    assert o2["new_session"] is False and o2["resumed"] is True
    assert o2["t_peek"] == 1


def test_sessions_do_not_serialize_behind_one_lock(setup):
    """The manager's global lock must not be held across filter compute:
    with one session's per-session lock held, a DIFFERENT session's update
    must still complete (head-of-line blocking fix)."""
    import threading

    model, params, x, u = setup
    from vqvaehmm_tpu.models.online import StreamManager

    m = StreamManager(model, params)
    m.update("a", x[:, 0], u[:, 0])
    m.update("b", x[:, 0], u[:, 0])

    # hold session a's compute lock and drive session b from another thread
    with m._session_locks["a"]:
        done = threading.Event()
        result = {}

        def drive_b():
            result["out"] = m.update("b", x[:, 1], u[:, 1])
            done.set()

        th = threading.Thread(target=drive_b)
        th.start()
        ok = done.wait(timeout=30.0)
        th.join(timeout=5.0)
    assert ok, "session b blocked behind session a's lock"
    assert result["out"]["t_peek"] == 1


def test_export_race_raises_instead_of_stale_snapshot(setup):
    """If a session is replaced (carried-state update / finish /
    concurrent export) while export_session waits on its per-session
    lock, the export must RAISE — returning the pre-replacement
    state_dict would hand out a stale snapshot while a newer filter
    stays live under the same id (two divergent streams).

    The race is made deterministic by shimming the per-session lock:
    its acquisition performs the replacement first, exactly as if a
    competing update had won the lock while the export was parked."""
    import threading

    from vqvaehmm_tpu.models.online import OnlineFilter, StreamManager

    model, params, x, u = setup
    mgr = StreamManager(model, params)
    mgr.update("s", x[:, 0], u[:, 0])
    f2 = OnlineFilter(model, params, step_fn=mgr._step_fn)

    class ReplacedWhileWaiting:
        """Lock whose acquisition races in a session replacement."""

        def __init__(self):
            self._inner = threading.Lock()

        def __enter__(self):
            with mgr._lock:
                mgr._sessions["s"] = f2
            return self._inner.__enter__()

        def __exit__(self, *exc):
            return self._inner.__exit__(*exc)

    mgr._session_locks["s"] = ReplacedWhileWaiting()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="replaced or closed"):
        mgr.export_session("s")
    # the replacement session is untouched and still live
    assert mgr._sessions["s"] is f2


def test_update_losing_to_export_raises_not_ghost(setup):
    """An update that loses its session to a concurrent EXPORT must
    raise SessionConflict instead of silently resurrecting the id as a
    fresh empty filter (a divergent ghost stream this worker would keep
    alive while the real state lives on another worker)."""
    import threading

    from vqvaehmm_tpu.models.online import SessionConflict, StreamManager

    model, params, x, u = setup
    mgr = StreamManager(model, params)
    mgr.update("s", x[:, 0], u[:, 0])

    class ExportsWhileWaiting:
        """Session lock whose acquisition exports the session first."""

        def __init__(self, inner):
            self._inner = inner
            self.armed = True

        def __enter__(self):
            if self.armed:
                self.armed = False
                mgr.export_session("s")
            return self._inner.__enter__()

        def __exit__(self, *exc):
            return self._inner.__exit__(*exc)

    mgr._session_locks["s"] = ExportsWhileWaiting(
        mgr._session_locks["s"])

    import pytest as _pytest

    with _pytest.raises(SessionConflict, match="exported or finished"):
        mgr.update("s", x[:, 1], u[:, 1])
    assert "s" not in mgr._sessions  # no ghost resurrected


def test_import_session_replacement_semantics(setup):
    """import_session over a LIVE id reuses its per-session lock (the
    replacement serializes behind in-flight updates) and does not count
    against max_sessions."""
    from vqvaehmm_tpu.models.online import StreamManager

    model, params, x, u = setup
    mgr = StreamManager(model, params, max_sessions=1)
    mgr.update("s", x[:, 0], u[:, 0])
    lock_before = mgr._session_locks["s"]
    blob = mgr._sessions["s"].state_dict()

    # replacement at the max_sessions cap must succeed (table not grown)
    mgr.import_session("s", blob)
    assert mgr._session_locks["s"] is lock_before
