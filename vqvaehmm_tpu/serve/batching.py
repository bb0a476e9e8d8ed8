"""Dynamic micro-batching for the serving surfaces.

The reference serves strictly one request per device call
(inference_api/app.py:56-75: each POST runs its own forward).  On TPU that
wastes the chip: a B=1 forward and a B=16 forward cost nearly the same
device time, so under concurrent load the right shape is ONE batched call
per dispatch window.  BatchingModel wraps InferenceModel with a
background dispatcher that:

  * queues concurrent /infer requests (each handler thread blocks on its
    own event),
  * groups them by padding bucket (same executable), pads the batch
    dimension up to a small power-of-two ladder so every dispatch hits a
    cached executable (no per-batch-size recompiles),
  * runs one jitted batched forward, slices each row back to its request
    length, and wakes the callers.

Bit-exactness: every op in the forward is per-sequence (conv/MLP/softmax
over channels and time — no cross-batch mixing), and padding rows/columns
are zeros exactly as the solo path pads, so a batched row equals the solo
result bit-for-bit (asserted in tests/test_batching.py).

Non-mean-field modes (smoothed/filtered/viterbi) and /predict pass through
unbatched — they are exact-inference paths used at far lower request
rates.
"""

from __future__ import annotations

import os
import threading
import time
from typing import List, Optional

import numpy as np


def _time_once(f, x) -> float:
    t0 = time.perf_counter()
    np.asarray(f(x))  # host fetch = real round-trip barrier
    return time.perf_counter() - t0

from .app import BATCH_LADDER as _BATCH_LADDER, InferenceModel
from .metrics import METRICS

# the batch-dimension ladder lives in serve/app.py (BATCH_LADDER): the
# bucket dispatch pin (_batch_align/_bucket_use_pallas) must know every
# batch size this dispatcher can produce


class ServerBusy(RuntimeError):
    """Raised by BatchingModel.infer when the request queue is at
    max_queue: the server sheds load instead of growing an unbounded
    backlog whose tail would time out anyway.  The HTTP surfaces map it
    to 503 so clients/load-balancers back off and retry."""


class _Pending:
    __slots__ = ("row", "bm", "T", "event", "result", "error")

    def __init__(self, padded: np.ndarray, T: int):
        # keep ONLY row 0 (the request) and the bucket's batch multiple:
        # app._padded's rows 1..bm-1 are zeros _run re-creates when it
        # allocates the batch — holding them per queued request would
        # multiply queue memory by bm for nothing
        self.row = padded[0]          # (C, pad_to)
        self.bm = padded.shape[0]     # fused kernel's lane multiple
        self.T = T
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None


class BatchingModel:
    """Drop-in wrapper around InferenceModel whose .infer() micro-batches
    concurrent mean-field requests into single device calls.

    max_batch:    largest batch per dispatch (clamped to the ladder).
    max_wait_ms:  how long the dispatcher waits to fill a batch after the
                  first request arrives.  0 disables waiting (batches only
                  what is already queued — still coalesces bursts).
    max_queue:    backpressure bound: requests arriving while max_queue
                  items are already waiting raise ServerBusy (HTTP 503)
                  instead of joining an unbounded backlog.  None
                  (default) keeps the queue unbounded — the 60s client
                  timeout is then the only shed mechanism.
    """

    # surfaces check this instead of isinstance so the check survives
    # proxying through app.ModelHandle (which delegates the attribute)
    is_batching = True

    def __init__(self, model: InferenceModel, max_batch: int = 16,
                 max_wait_ms: float = 2.0, pipeline_depth: int = 2,
                 max_queue: Optional[int] = None):
        self._inner = model
        self.max_batch = max(1, min(max_batch, _BATCH_LADDER[-1]))
        self.max_wait_s = max_wait_ms / 1e3
        self.max_queue = max_queue
        self._queue: List[_Pending] = []
        self._lock = threading.Lock()
        self._wakeup = threading.Event()
        self._stop = False
        # telemetry for tests/ops: device calls vs requests served
        self.dispatches = 0
        self.requests = 0
        # pipeline_depth > 1 keeps several batched device calls in flight
        # (dispatch i+1's host work and transfer overlap dispatch i's
        # compute) — the jitted forward is thread-safe, and results are
        # routed per-request by the events, so ordering does not matter.
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(1, pipeline_depth))
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._thread.start()
        self._warn_if_high_rtt()

    def _warn_if_high_rtt(self) -> None:
        """One startup probe of the host<->device dispatch round-trip.

        Micro-batching's win assumes the server is CO-LOCATED with the
        chip: measured through a ~26 ms-RTT device tunnel, per-request
        dispatch served ~3x MORE HTTP throughput than batching at ladder
        caps (BENCH_NOTES "Serving micro-batching" — the linger window
        and the RTT serialize).  If one trivial dispatch round-trips
        slower than VQHMM_RTT_WARN_MS (default 5 ms), say so loudly at
        startup instead of letting the operator discover the regression
        in production graphs."""
        try:
            import jax

            jnp = self._inner._jnp
            f = jax.jit(lambda a: a + 1)
            x = jnp.zeros((), jnp.float32)
            np.asarray(f(x))  # compile outside the timed probes
            rtt = min(_time_once(f, x) for _ in range(3))
        except Exception:  # a failed probe must never sink serving
            return
        warn_ms = float(os.environ.get("VQHMM_RTT_WARN_MS", "5"))
        if rtt * 1e3 > warn_ms:
            import sys

            print(f"WARNING: device dispatch RTT ~{rtt * 1e3:.1f} ms "
                  f"(> {warn_ms:.0f} ms): this server does not look "
                  "co-located with its accelerator. Micro-batching "
                  "SERIALIZES on that RTT and measured ~3x SLOWER than "
                  "per-request dispatch through a high-RTT link "
                  "(docs/serving.md 'Where to run the batcher') — "
                  "consider serving without --batch here.",
                  file=sys.stderr, flush=True)

    @property
    def stopped(self) -> bool:
        """True once close() ran: the dispatcher is gone and infer()
        raises — callers holding the process-wide handle use this to
        rebuild instead of wrapping a dead dispatcher
        (app.ModelHandle.configure_batching)."""
        with self._lock:
            return self._stop

    def reconfigure(self, max_batch: int = 16, max_wait_ms: float = 2.0,
                    max_queue: Optional[int] = None) -> None:
        """Apply new dispatch settings to the LIVE dispatcher.  All three
        are plain attributes read per operation (max_batch in
        _take_group/_run, max_wait_s in the linger loop, max_queue in
        infer), so in-place assignment is safe and takes effect on the
        next dispatch — no rebuild, queued requests unaffected."""
        self.max_batch = max(1, min(max_batch, _BATCH_LADDER[-1]))
        self.max_wait_s = max_wait_ms / 1e3
        self.max_queue = max_queue

    def warmup(self, lengths=(200,), exact_modes: bool = True):
        """Compile the executable ladder up front (every batch-bucket x
        length-bucket pair that dispatches could hit) so no request pays a
        compile.  Production servers should call this at startup.

        Covers the vector-valid_to batched executables AND the
        scalar-valid_to solo path (used by predict() and the non-mean-field
        passthrough, which bypass the dispatcher — round-2 advisor
        finding); exact_modes also warms the smoothed/filtered/viterbi
        jits per bucket."""
        from .app import DEFAULT_BUCKETS

        jnp = self._inner._jnp
        C = self._inner.cfg.model.input_dim
        buckets = sorted({next((b for b in DEFAULT_BUCKETS if b >= T), T)
                          for T in lengths})
        for pad_to in buckets:
            probe, _ = self._inner._padded(
                [[0.0] * pad_to for _ in range(C)])
            bm = probe.shape[0]  # solo batch multiple for this bucket
            # exactly the pad_b values _run can dispatch: the next ladder
            # rung >= each possible group size (which may exceed
            # max_batch when it is not itself a rung), floored at bm
            pad_bs = {max(next(b for b in _BATCH_LADDER if b >= B), bm)
                      for B in range(1, self.max_batch + 1)}
            pin = self._inner._bucket_use_pallas(pad_to)
            for pad_b in sorted(pad_bs):
                x = jnp.zeros((pad_b, C, pad_to), jnp.float32)
                ln = jnp.ones((pad_b,), jnp.int32)
                self._inner._infer(x, ln, pin)
            # solo scalar-valid_to executable (predict / passthrough path)
            self._inner._infer(jnp.asarray(probe), pad_to, pin)
            if exact_modes:
                U = self._inner.cfg.model.u_dim or 0
                xp = jnp.asarray(probe[:1])
                up = jnp.zeros((1, U, pad_to), jnp.float32)
                lens = jnp.asarray([pad_to], jnp.int32)
                self._inner._smoothed(xp, up, lens)
                self._inner._filtered(xp, up, lens)
                self._inner._viterbi(xp, up, lens)

    # -- the contract surface (same as InferenceModel) --------------------

    def infer(self, x: List[List[float]], u=None, mode: str = "mean_field"):
        if mode != "mean_field":
            return self._inner.infer(x, u=u, mode=mode)  # pass-through
        padded, T = self._inner._padded(x)  # validates shape; raises ValueError
        item = _Pending(padded, T)
        with self._lock:
            if self._stop:
                raise RuntimeError("batching dispatcher shut down")
            if self.max_queue is not None \
                    and len(self._queue) >= self.max_queue:
                raise ServerBusy(
                    f"request queue full ({self.max_queue}); retry")
            self._queue.append(item)
            self.requests += 1
        self._wakeup.set()
        # bounded: if the dispatcher died (bug, shutdown race) the caller
        # must error out, not hang its server thread forever
        if not item.event.wait(timeout=max(60.0, 30 * self.max_wait_s)):
            raise RuntimeError(
                "batched inference timed out (dispatcher stalled?)")
        if item.error is not None:
            raise item.error
        return item.result

    def __getattr__(self, name):
        # true drop-in: anything not overridden (cfg, params, model
        # — the raw VAEHMM — checkpoint_loaded, _padded, _infer, ...)
        # proxies to the wrapped InferenceModel, so surfaces written
        # against InferenceModel (gradio reads m.cfg / m.model.posterior /
        # m.params) work unchanged when get_model returns a BatchingModel
        # under VQHMM_BATCH.  NOTE: self._inner is the InferenceModel;
        # `self.model` therefore resolves here to the VAEHMM, exactly as
        # on InferenceModel itself.
        return getattr(self._inner, name)

    def predict(self, x: List[List[float]]):
        return self._inner.predict(x)

    def stream(self, *args, **kwargs):
        return self._inner.stream(*args, **kwargs)

    def close(self, drain: bool = False, drain_timeout: float = 30.0):
        """drain=True lets already-queued requests finish before the
        dispatcher stops (used by hot-reload, which must not fail the
        old model's in-flight work — app.ModelHandle.reload); requests
        still queued past drain_timeout fail as on a plain close."""
        if drain:
            deadline = time.monotonic() + drain_timeout
            while time.monotonic() < deadline:
                with self._lock:
                    if not self._queue:
                        break
                time.sleep(0.005)
        with self._lock:
            self._stop = True
        self._wakeup.set()
        # fail queued items FIRST: after the 5s join timeout the
        # dispatcher could still pop a group and hit the shut-down pool;
        # the loop's exception guard then fails that group too, so no
        # caller is ever left waiting
        with self._lock:
            leftovers, self._queue = self._queue, []
        for it in leftovers:
            it.error = RuntimeError("batching dispatcher shut down")
            it.event.set()
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=True)

    # -- dispatcher --------------------------------------------------------

    def _take_group(self) -> List[_Pending]:
        """Pop up to max_batch queued items sharing the first item's
        padding bucket (same executable shape)."""
        with self._lock:
            if not self._queue:
                return []
            bucket = self._queue[0].row.shape[1]
            group, rest = [], []
            for it in self._queue:
                if len(group) < self.max_batch \
                        and it.row.shape[1] == bucket:
                    group.append(it)
                else:
                    rest.append(it)
            self._queue = rest
            if rest:
                self._wakeup.set()  # more work waiting
            return group

    def _dispatch_loop(self):
        while not self._stop:
            self._wakeup.wait(timeout=0.1)
            self._wakeup.clear()
            if self._stop:
                break
            # linger briefly so a burst lands in one batch; count only
            # the HEAD bucket's items (what _take_group can dispatch) —
            # a mixed-bucket burst must not end the wait early with an
            # undersized group
            if self.max_wait_s > 0:
                deadline = time.monotonic() + self.max_wait_s
                while time.monotonic() < deadline:
                    with self._lock:
                        if not self._queue:
                            n = 0
                        else:
                            bucket = self._queue[0].row.shape[1]
                            n = sum(1 for it in self._queue
                                    if it.row.shape[1] == bucket)
                    if n >= self.max_batch or n == 0:
                        break
                    time.sleep(min(2e-4, self.max_wait_s / 4))
            group = self._take_group()
            if group:
                try:
                    self._pool.submit(self._run, group)
                except Exception as e:  # pool shut down mid-race, etc.
                    for it in group:
                        if not it.event.is_set():
                            it.error = e
                            it.event.set()

    def _run(self, group: List[_Pending]):
        jnp = self._inner._jnp
        try:
            B = len(group)
            # at least the solo path's batch multiple (kernel-eligible
            # block geometry — see app._padded) so batched dispatches use
            # the same fused executable family as solo requests
            bm = group[0].bm
            pad_b = max(next(b for b in _BATCH_LADDER if b >= B), bm)
            C, pad_to = group[0].row.shape
            batch = np.zeros((pad_b, C, pad_to), np.float32)
            lengths = np.zeros(pad_b, np.int32)  # padded rows: bound at 0
            for i, it in enumerate(group):
                batch[i] = it.row
                lengths[i] = it.T
            # per-sequence valid_to vector: each coalesced request keeps
            # its own time bound -> bit-identical to its solo result.
            # the dispatch pin (use_pallas per BUCKET, not per shape)
            # guarantees this batch takes the same executable family the
            # solo path did — see app._bucket_use_pallas
            mu, logvar, q = self._inner._infer(
                jnp.asarray(batch), jnp.asarray(lengths),
                self._inner._bucket_use_pallas(pad_to))
            mu = np.asarray(mu)
            logvar = np.asarray(logvar)
            q = np.asarray(q)
            with self._lock:  # _run may execute on several pool threads
                self.dispatches += 1
            # actual coalesced size (not pad_b): the /metrics histogram
            # answers "how full are my batches" (serve/metrics.py)
            METRICS.observe_batch(B)
            from .app import require_finite_output

            for i, it in enumerate(group):
                T = it.T
                try:
                    # per ROW: one request's overflow-magnitude input
                    # must 400 that request alone, not its batch-mates
                    require_finite_output(mu[i, :, :T], logvar[i, :, :T],
                                          q[i, :, :T])
                except ValueError as e:
                    it.error = e
                    it.event.set()
                    continue
                it.result = {
                    "mu": mu[i, :, :T].tolist(),
                    "logvar": logvar[i, :, :T].tolist(),
                    "regime_probs": q[i, :, :T].tolist(),
                }
                it.event.set()
        except Exception as e:  # wake every UNDELIVERED caller
            for it in group:
                if not it.event.is_set():  # delivered results stay valid
                    it.error = e
                    it.event.set()
