"""Streaming (online) exact HMM filtering — feed observations one frame at
a time, get the filtered regime posterior incrementally.

Why: the batch `VAEHMM.filtered_posterior` needs the whole sequence up
front, so a live-trading consumer would re-run O(T) work on every new tick
(exactly the reference's backtester pattern of re-encoding a window per
step — reference backtesting.py:43-44).  OnlineFilter carries the HMM
forward state across updates and does O(1) work per frame: one 5-wide
encoder window for the new evidence column plus one log-space forward step.

Semantics: identical to the batch path, with its lookahead made explicit.
The encoder is two stacked k=3 SAME convs (receptive radius 2), so the
emission at time t depends on x[t-2..t+2]; a frame's evidence is *settled*
once two more frames have arrived.  `update` therefore emits the filtered
posterior for t = n-3 on the n-th frame — each emitted column equals the
corresponding column of `filtered_posterior` run over the full stream
(tests/test_online.py asserts equality) — `peek` gives a provisional
estimate for the newest frame (zero right-context, exactly what the batch
path reports at the sequence end), and `finish` flushes the last two frames
with end-of-sequence semantics.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise import plog_softmax, plogsumexp, psoftmax


def make_step_fn(model):
    """One jitted evidence+forward step for OnlineFilter.  Module-level so
    a server compiles it ONCE per model and shares it across sessions
    (a per-instance closure would re-trace — and re-compile — for every
    new stream session, stalling other sessions behind the compile)."""

    def _step(params, xwin, u_t, col, valid_to, alpha_prev, is_first):
        # evidence column: encoder over the 5-frame window, bounded at
        # valid_to exactly like the batch path's max(lengths) bound
        logits = model.encode(params, xwin, valid_to=valid_to)
        logq = plog_softmax(logits, axis=1)[0, :, col]
        # pointwise transition for this step from u_t (prior MLP);
        # (1,1,U) is dim-sniffed as (B,T,U), the layout we mean
        log_pi, log_A = model.prior(params, u_t[None, None, :])
        lA = log_A[0, 0]
        a_first = log_pi + logq
        a_next = plogsumexp(alpha_prev[:, None] + lA, axis=0) + logq
        alpha = jnp.where(is_first, a_first, a_next)
        return alpha, psoftmax(alpha)

    return jax.jit(_step)


class OnlineFilter:
    """Incremental filtered regime posterior over a live stream.

    Usage:
        f = OnlineFilter(model, params)
        for x_t, u_t in stream:            # x_t:(C,), u_t:(U,)
            for t, q in f.update(x_t, u_t):   # settled columns (lag 2)
                ...
        for t, q in f.finish():            # the last two columns
            ...
    """

    W = 5  # window width = encoder receptive field (2 convs, radius 2)

    def __init__(self, model, params, step_fn=None):
        self.model = model
        self.params = params
        cfg = model.cfg
        self.K, self.C, self.U = cfg.K, cfg.input_dim, (cfg.u_dim or 0)
        # frames are pruned once no future settle/peek can read them:
        # _x[0] holds global frame index _base (see _prune)
        self._x: List[np.ndarray] = []
        self._u: List[np.ndarray] = []
        self._base = 0
        self._n = 0                          # total frames received
        self._next = 0                       # next frame index to settle
        self._alpha = np.zeros(self.K, np.float32)
        self._finished = False
        self._step = step_fn if step_fn is not None else make_step_fn(model)

    # ------------------------------------------------------------------

    def update(self, x_t, u_t) -> List[Tuple[int, np.ndarray]]:
        """Feed one frame; return the newly settled (t, q:(K,)) columns
        (empty for the first two frames, one per call afterwards)."""
        if self._finished:
            raise RuntimeError("finish() already called; reset() to reuse")
        x_t = np.asarray(x_t, np.float32).reshape(self.C)
        u_t = np.asarray(u_t, np.float32).reshape(self.U)
        self._x.append(x_t)
        self._u.append(u_t)
        self._n += 1
        out = []
        while self._next <= self._n - 3:
            out.append(self._settle(self._next, limit=self._n))
        self._prune()
        return out

    def _prune(self):
        """Drop frames no future settle or peek can read (window left edge
        is _next - 2), so memory stays O(1) over unbounded streams."""
        keep_from = max(0, self._next - 2)
        if keep_from > self._base:
            drop = keep_from - self._base
            del self._x[:drop]
            del self._u[:drop]
            self._base = keep_from

    def finish(self) -> List[Tuple[int, np.ndarray]]:
        """End of stream: settle the remaining (up to two) frames with
        end-of-sequence padding semantics."""
        if self._finished:
            return []
        self._finished = True
        out = []
        while self._next < self._n:
            out.append(self._settle(self._next, limit=self._n))
        return out

    def peek(self) -> Optional[np.ndarray]:
        """Provisional filtered posterior (K,) for the NEWEST frame, as if
        the stream ended now (zero right-context — this is exactly what the
        batch filtered_posterior reports at the sequence end).  Does not
        advance the filter state."""
        if self._n == 0:
            return None
        alpha = self._alpha
        q = psoftmax(jnp.asarray(alpha))  # only used when already settled
        for s in range(self._next, self._n):
            alpha, q = self._run_step(s, limit=self._n, alpha=alpha)
        return np.asarray(q)

    def reset(self):
        self._x, self._u = [], []
        self._base = 0
        self._n = 0
        self._next = 0
        self._alpha = np.zeros(self.K, np.float32)
        self._finished = False

    @property
    def n_frames(self) -> int:
        return self._n

    # -- session migration ---------------------------------------------

    def state_dict(self) -> dict:
        """Complete, JSON-serializable filter state: a session exported
        here and imported elsewhere (load_state) continues the stream
        with identical outputs — the escape hatch for the per-process
        session limitation of multi-worker serving (docs/serving.md)."""
        return {
            "x": [v.tolist() for v in self._x],
            "u": [v.tolist() for v in self._u],
            "base": self._base,
            "n": self._n,
            "next": self._next,
            "alpha": self._alpha.tolist(),
            "finished": self._finished,
        }

    def load_state(self, state: dict) -> None:
        self._x = [np.asarray(v, np.float32) for v in state["x"]]
        self._u = [np.asarray(v, np.float32) for v in state["u"]]
        self._base = int(state["base"])
        self._n = int(state["n"])
        self._next = int(state["next"])
        self._alpha = np.asarray(state["alpha"], np.float32)
        self._finished = bool(state["finished"])

    # ------------------------------------------------------------------

    def _run_step(self, s: int, limit: int, alpha):
        """One evidence+forward step for frame s (pure; no state writes).

        Window covers globals [w0, w0+5); frames >= limit are zero-filled
        and conv activations masked at valid_to = limit - w0, replicating
        the batch path's zero padding + max(lengths) bound.  Frames beyond
        the buffer but < limit never influence column s (receptive radius
        2; s <= n-3 there), so zero-filling them is exact.
        """
        w0 = max(0, s - 2)
        xwin = np.zeros((1, self.C, self.W), np.float32)
        hi = min(limit, self._n, w0 + self.W)
        for g in range(max(w0, self._base), hi):
            xwin[0, :, g - w0] = self._x[g - self._base]
        col = s - w0
        valid_to = min(limit - w0, self.W)
        return self._step(self.params, jnp.asarray(xwin),
                          jnp.asarray(self._u[s - self._base]),
                          jnp.asarray(col, jnp.int32),
                          jnp.asarray(valid_to, jnp.int32),
                          jnp.asarray(alpha),
                          jnp.asarray(s == 0))

    def _settle(self, s: int, limit: int) -> Tuple[int, np.ndarray]:
        alpha, q = self._run_step(s, limit, self._alpha)
        self._alpha = np.asarray(alpha)
        self._next = s + 1
        return s, np.asarray(q)


class SessionConflict(ValueError):
    """Transient per-session race: the session was replaced or removed
    (export, finish, carried-state replacement) while this call waited
    on its lock.  Subclasses ValueError so HTTP layers keep mapping it
    to a client error, but callers can catch it specifically to retry
    or re-route (a plain 'no open session' ValueError is permanent)."""


class StreamManager:
    """Named OnlineFilter sessions for the serving layer (POST /stream).

    Sessions share ONE jitted step function (compiled on the first
    session) and expire after ttl_seconds without traffic, so abandoned
    streams (clients that never send finish=true) cannot pin slots or
    memory forever."""

    def __init__(self, model, params, max_sessions: int = 256,
                 ttl_seconds: float = 3600.0):
        self.model, self.params = model, params
        self.max_sessions = max_sessions
        self.ttl_seconds = ttl_seconds
        self._sessions: Dict[str, OnlineFilter] = {}
        self._touched: Dict[str, float] = {}
        self._step_fn = make_step_fn(model)
        import threading

        self._threading = threading
        # The global lock guards ONLY the session tables (lookup, TTL,
        # create/delete); filter compute runs under a per-session lock so
        # concurrent streams never serialize behind one device step
        # (round-2 advisor finding, head-of-line blocking).
        self._lock = threading.Lock()
        self._session_locks: Dict[str, object] = {}

    def n_sessions(self) -> int:
        """Live (unexpired) session count — the serving /metrics gauge."""
        import time as _time

        with self._lock:
            self._expire(_time.monotonic())
            return len(self._sessions)

    def export_session(self, session: str) -> dict:
        """Serialize and REMOVE a session (hand-off to another worker).

        Ordering: acquire the per-session lock FIRST, then deregister
        under the global lock.  Popping before acquiring would race an
        update that has already looked the session up — the update could
        process a frame the exported state misses (the update side
        re-checks registration after acquiring its lock and retries, so
        whichever side wins the session lock, no frame is lost)."""
        with self._lock:
            f = self._sessions.get(session)
            lock = self._session_locks.get(session)
            if f is None:
                raise ValueError(f"no open session {session!r}")
        with lock:
            with self._lock:
                if self._sessions.get(session) is not f:
                    # Lost the race: a carried-state update, a finish, or a
                    # concurrent export replaced/removed this session while
                    # we waited for its lock.  Returning f.state_dict() here
                    # would hand out a STALE snapshot while a newer filter
                    # stays live under the same id — two divergent streams.
                    raise SessionConflict(
                        f"session {session!r} was replaced or closed "
                        "during export; if it was replaced, retry — if "
                        "it was finished, there is nothing to export")
                self._sessions.pop(session, None)
                self._touched.pop(session, None)
                self._session_locks.pop(session, None)
            return f.state_dict()

    def import_session(self, session: str, state: dict) -> None:
        """Adopt a session exported elsewhere; continues bit-identically.

        Replacing a live session reuses its per-session lock (like the
        carried-state branch of update) so the replacement serializes
        behind any in-flight update instead of computing concurrently,
        and a replacement does not count against max_sessions."""
        with self._lock:
            if session not in self._sessions \
                    and len(self._sessions) >= self.max_sessions:
                raise ValueError("too many open stream sessions")
            f = OnlineFilter(self.model, self.params,
                             step_fn=self._step_fn)
            f.load_state(state)
            self._sessions[session] = f
            self._session_locks.setdefault(session,
                                           self._threading.Lock())
            import time as _time

            self._touched[session] = _time.monotonic()

    def _expire(self, now: float) -> None:
        stale = [k for k, t in self._touched.items()
                 if now - t > self.ttl_seconds]
        for k in stale:
            del self._sessions[k]
            del self._touched[k]
            self._session_locks.pop(k, None)

    def update(self, session: str, x_t, u_t, finish: bool = False,
               state: Optional[dict] = None,
               carry_state: bool = False) -> dict:
        """Feed one frame to a named session.

        Multi-worker story (docs/serving.md): pass `carry_state=True` and
        the response includes the complete serialized filter state; a
        client that sends that state back with its next request
        (`state=...`) can hit ANY worker with no affinity.  A carried
        state ALWAYS takes precedence: it replaces whatever local filter
        this worker holds under the same id (the local copy is stale by
        construction whenever the client bounced through another worker
        in between), so mixed routing stays deterministic — the client's
        echoed state is the single source of truth.  The response's
        `new_session` flag tells the client whether this request started
        a fresh filter (so a silently expired session can be detected
        instead of inferred from t indices — round-2 advisor finding).
        """
        import time as _time

        while True:
            with self._lock:
                now = _time.monotonic()
                self._expire(now)
                f = self._sessions.get(session)
                new_session = f is None
                resumed = False
                if state is not None:
                    # client-carried state wins over any (stale) local
                    # session — see docstring
                    if f is None \
                            and len(self._sessions) >= self.max_sessions:
                        raise ValueError("too many open stream sessions")
                    f = OnlineFilter(self.model, self.params,
                                     step_fn=self._step_fn)
                    f.load_state(state)
                    resumed = True
                    new_session = False
                    self._sessions[session] = f
                    # reuse an existing per-session lock so a replacement
                    # serializes behind any in-flight update on the old
                    # filter instead of computing concurrently with it
                    self._session_locks.setdefault(
                        session, self._threading.Lock())
                elif f is None:
                    if len(self._sessions) >= self.max_sessions:
                        raise ValueError("too many open stream sessions")
                    f = OnlineFilter(self.model, self.params,
                                     step_fn=self._step_fn)
                    self._sessions[session] = f
                    self._session_locks[session] = self._threading.Lock()
                self._touched[session] = now
                slock = self._session_locks[session]

            with slock:
                with self._lock:
                    if self._sessions.get(session) is not f:
                        if (not new_session and state is None
                                and session not in self._sessions):
                            # the session we were updating was EXPORTED
                            # or FINISHED while we waited: retrying would
                            # resurrect the id as a fresh empty filter —
                            # a divergent ghost stream this worker keeps
                            # alive while the real state lives elsewhere.
                            # The frame must be re-sent to the session's
                            # new home (or with carried state).
                            raise SessionConflict(
                                f"session {session!r} was exported or "
                                "finished while this update waited; "
                                "re-send the frame to the session's new "
                                "home (or attach carried state)")
                        # replaced (carried-state/import) — retry against
                        # the current tables so no frame lands on an
                        # orphaned filter
                        continue
                return self._update_locked(f, session, x_t, u_t, finish,
                                           carry_state, new_session,
                                           resumed)

    def _update_locked(self, f, session, x_t, u_t, finish, carry_state,
                       new_session, resumed) -> dict:
        """Body of update() once the per-session lock is held and the
        session is confirmed registered."""
        settled = f.update(x_t, u_t) if x_t is not None else []
        out = {"settled": [{"t": t, "regime_probs": q.tolist()}
                           for t, q in settled],
               "new_session": new_session and not resumed,
               "resumed": resumed}
        if finish:
            out["settled"] += [{"t": t, "regime_probs": q.tolist()}
                               for t, q in f.finish()]
            with self._lock:
                # identity check: never deregister a NEWER filter another
                # thread registered under the same id while we computed
                if self._sessions.get(session) is f:
                    self._sessions.pop(session, None)
                    self._touched.pop(session, None)
                    self._session_locks.pop(session, None)
        else:
            peek = f.peek()
            out["peek"] = peek.tolist() if peek is not None else None
            out["t_peek"] = f.n_frames - 1
            if carry_state:
                out["state"] = f.state_dict()
        return out
