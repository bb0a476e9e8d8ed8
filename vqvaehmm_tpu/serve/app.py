"""FastAPI inference server (reference: inference_api/app.py:14-75).

Same HTTP contract: GET /health -> {"status": "ok"}; POST /infer with
{"x": [[...C rows of T floats...]]} -> {"mu", "logvar", "regime_probs"}.

TPU-native serving: the model forward is jit-compiled once at load; request
sequences are right-padded to a fixed bucket ladder so every request hits a
cached executable (no per-shape recompiles), and outputs are sliced back to
the request length — bit-identical to running unpadded because encode/decode
are given valid_to (see models/vae_hmm._time_bound_mask).

Also fixes the reference's broken Flask twin (api.py:18 calls a method that
does not exist — SURVEY.md section 4.1); /predict here is a working
equivalent returning portfolio weights when a head checkpoint is configured.
"""

# NO `from __future__ import annotations` here, deliberately: FastAPI
# resolves STRING annotations against fn.__globals__, so postponed
# annotations break route registration for the pydantic request models
# and the Request param, which are create_app locals (NameError at
# decoration time under the real fastapi).  Eager annotations evaluate
# to the actual objects, which FastAPI accepts regardless of scope.
# Caught by tests/test_asgi.py::test_fastapi_app_serves_via_stub.

import hmac
import json
import os
import threading
from functools import lru_cache
from typing import List, Optional

import numpy as np

DEFAULT_BUCKETS = (32, 64, 128, 256, 512)
# request-body bound shared across all three surfaces (httpd/asgi use
# their _MAX_BODY twins; the FastAPI middleware checks the declared
# Content-Length because uvicorn imposes no bound of its own)
MAX_BODY = 64 * 1024 * 1024


def declared_body_too_large(content_length) -> bool:
    """True iff a Content-Length header declares a body beyond MAX_BODY."""
    return bool(content_length) and str(content_length).isdigit() \
        and int(content_length) > MAX_BODY


def _require_finite_input(arr: np.ndarray, name: str) -> None:
    """NaN/Inf inputs are a client error (400), rejected BEFORE any
    compute — a non-finite frame would otherwise poison streaming filter
    state and propagate NaNs through every output."""
    if not np.isfinite(arr).all():
        raise ValueError(f"{name} contains non-finite values")


def require_finite_output(*arrays) -> None:
    """Finite-but-absurd input magnitudes (e.g. 1e308) overflow the
    forward to inf/NaN.  That is the CLIENT's input, not a server fault:
    raise ValueError (-> 400 on every surface) instead of emitting
    invalid `Infinity` JSON or a misleading 500.  Checked per request so
    one poisoned row never fails its batch-mates (serve/batching._run)."""
    for a in arrays:
        if not np.isfinite(a).all():
            raise ValueError(
                "model produced non-finite outputs for this input "
                "(input magnitude out of range?)")
# batch-dimension ladder shared with serve/batching.py: every
# dispatch pads B up to one of these rungs
BATCH_LADDER = (1, 2, 4, 8, 16, 32)


class InferenceModel:
    """Lazy singleton wrapping a jitted VAEHMM (reference :24-48)."""

    is_batching = False  # type check the surfaces use (see ModelHandle)

    def __init__(self, config_path: str = "inference_config.json"):
        import jax
        import jax.numpy as jnp

        from ..core.config import load_config
        from ..models.vae_hmm import VAEHMM

        self.cfg = load_config(config_path)
        self.model = VAEHMM(self.cfg.model)
        ckpt = self.cfg.checkpoint_path
        loaded = False
        # accept the path verbatim OR with the implicit .npz suffix
        # (configuring "m.npz" must not probe "m.npz.npz" and miss)
        npz = ckpt if (ckpt or "").endswith(".npz") else (ckpt or "") + ".npz"
        if ckpt and os.path.exists(npz):
            from ..data.checkpoint import load_params_npz

            self.params = load_params_npz(npz)
            loaded = True
        elif ckpt and os.path.exists(ckpt) and ckpt.endswith((".pt", ".pth")):
            from ..utils.torch_interop import (load_torch_file,
                                               vae_hmm_params_from_state_dict)

            self.params = vae_hmm_params_from_state_dict(
                load_torch_file(ckpt))
            loaded = True
        else:
            self.params = self.model.init(jax.random.PRNGKey(0))
            if ckpt:
                # a configured-but-missing checkpoint is the most common
                # misconfiguration; random-init weights would otherwise
                # serve silently (the reference crashes here instead —
                # inference_api/app.py:45). Demo-friendly default: warn
                # loudly; production: VQHMM_REQUIRE_CHECKPOINT=1 fails.
                import sys

                msg = (f"checkpoint_path {ckpt!r} is configured but no "
                       "checkpoint was found; serving UNTRAINED "
                       "random-init weights")
                if os.environ.get("VQHMM_REQUIRE_CHECKPOINT",
                                  "") not in ("", "0"):
                    raise FileNotFoundError(msg)
                print(f"WARNING: {msg} (set VQHMM_REQUIRE_CHECKPOINT=1 "
                      "to fail instead)", file=sys.stderr, flush=True)
        self.checkpoint_loaded = loaded
        if loaded:
            # fail at STARTUP on a config/checkpoint mismatch, not as
            # request-time 500s (all three servers route through here)
            from ..data.checkpoint import validate_params_for

            validate_params_for(self.model, self.params,
                                what=f"checkpoint {ckpt!r}")

        self._jnp = jnp

        def _infer(x, valid_to, use_pallas=None):
            # encode -> precise softmax -> decode; use_pallas is decided
            # ONCE PER BUCKET (_bucket_use_pallas) so solo and
            # micro-batched dispatches always take the same executable
            # family — per-shape auto-dispatch could route a coalesced
            # batch to the fused kernel while the solo path ran XLA,
            # making the same request's bytes depend on its neighbors.
            return self.model.infer_forward(self.params, x,
                                            valid_to=valid_to,
                                            use_pallas=use_pallas)

        # valid_to may be a scalar (solo path) or a per-sequence (B,)
        # vector (micro-batched path, serve/batching.py): requests of
        # different lengths coalesced into one batch each keep their own
        # bound, so a batched row is bit-identical to its solo result
        # (_time_bound_mask vector form; the fused kernel takes the same
        # (1, N) mask row).
        self._infer = jax.jit(_infer, static_argnums=(2,))
        # Exact-inference modes jit once per padding bucket, like _infer —
        # repeated same-bucket requests hit a cached executable instead of
        # retracing per request.
        # created eagerly: a lazy hasattr-guarded init would race under
        # the threaded servers (two first /stream requests could each
        # build a manager, silently dropping one's sessions)
        from ..models.online import StreamManager

        self._streams = StreamManager(self.model, self.params)
        self.bind_metrics()
        self._smoothed = jax.jit(
            lambda x, u, lens: self.model.smoothed_posterior(
                self.params, x, u, lens))
        self._filtered = jax.jit(
            lambda x, u, lens: self.model.filtered_posterior(
                self.params, x, u, lens))
        self._viterbi = jax.jit(
            lambda x, u, lens: self.model.viterbi_decode(
                self.params, x, u, lens))

    def bind_metrics(self) -> None:
        """Point the /metrics live-value gauges at THIS model.  Register
        replaces, so a reloaded model never leaves a stale closure; a
        FAILED reload calls this on the still-serving model to undo the
        half-built candidate's registration (ModelHandle.reload)."""
        from .metrics import METRICS

        METRICS.register_gauge(
            "vqhmm_stream_sessions", self._streams.n_sessions,
            "Live streaming sessions in this worker process.")
        METRICS.register_gauge(
            "vqhmm_checkpoint_loaded",
            lambda: 1.0 if self.checkpoint_loaded else 0.0,
            "1 iff serving weights came from a checkpoint "
            "(0 = random init).")

    def _padded(self, x: List[List[float]]):
        with np.errstate(over="ignore"):  # f32-overflow inputs are a
            arr = np.asarray(x, np.float32)  # handled 400, not log noise
        if arr.ndim != 2 or arr.shape[0] != self.cfg.model.input_dim:
            raise ValueError(
                f"x must be [C={self.cfg.model.input_dim}][T] floats, got "
                f"shape {arr.shape}")
        _require_finite_input(arr, "x")
        C, T = arr.shape
        pad_to = next((b for b in DEFAULT_BUCKETS if b >= T), T)
        # Pad the batch dimension up to the fused kernel's lane multiple
        # (ops/pallas_infer.batch_multiple) so solo and micro-batched
        # requests share the same block geometry — on TPU both then take
        # the fused kernel and stay bit-identical to each other.
        padded = np.zeros((self._batch_align(pad_to), C, pad_to),
                          np.float32)
        padded[0, :, :T] = arr
        return padded, T

    def _batch_align(self, pad_to: int) -> int:
        """Batch rows to allocate for this length bucket: the fused
        kernel's lane multiple on TPU (so solo and micro-batched requests
        share one block geometry and stay bit-identical), 1 elsewhere —
        off-TPU the kernel never runs and extra rows would just multiply
        the XLA forward's work.  Memoized per bucket: the backend probe
        and support check are constants, not per-request work."""
        cache = self.__dict__.setdefault("_batch_align_cache", {})
        if pad_to in cache:
            return cache[pad_to][0]
        bm, fused_ok = 1, False
        if pad_to % 8 == 0:
            import jax

            from ..ops.pallas_infer import batch_multiple, supported

            m = batch_multiple(pad_to)
            if m <= 8 and jax.default_backend() == "tpu":
                # the kernel must be eligible at EVERY batch size the
                # micro-batcher can dispatch for this bucket, or a
                # coalesced batch would take a different executable
                # family than the solo path
                pad_bs = {max(b, m) for b in BATCH_LADDER}
                fused_ok = all(supported(self.cfg.model, b, pad_to)
                               for b in sorted(pad_bs))
                if fused_ok:
                    bm = m
        cache[pad_to] = (bm, fused_ok)
        return bm

    def _bucket_use_pallas(self, pad_to: int):
        """Per-bucket dispatch pin: None (auto -> fused on TPU) only
        when the WHOLE batch ladder is kernel-eligible for this bucket,
        else False everywhere (see _batch_align)."""
        self._batch_align(pad_to)
        return None if self._batch_align_cache[pad_to][1] else False

    def infer(self, x: List[List[float]], u: Optional[List[List[float]]] = None,
              mode: str = "mean_field"):
        """mode extends the reference contract (default unchanged):
        'smoothed' / 'filtered' run exact HMM inference over the Prior's
        transitions; 'viterbi' returns the MAP state path as "states"
        (all three require `u` with matching T).  Each mode is jitted once
        per padding bucket."""
        jnp = self._jnp
        padded, T = self._padded(x)
        mu, logvar, q = self._infer(
            jnp.asarray(padded), T,
            self._bucket_use_pallas(padded.shape[2]))
        mu_r, lv_r, q_r = (np.asarray(mu)[0, :, :T],
                           np.asarray(logvar)[0, :, :T],
                           np.asarray(q)[0, :, :T])
        require_finite_output(mu_r, lv_r, q_r)
        out = {
            "mu": mu_r.tolist(),
            "logvar": lv_r.tolist(),
            "regime_probs": q_r.tolist(),
        }
        if mode != "mean_field":
            if u is None:
                raise ValueError(f"mode={mode!r} requires field 'u'")
            u_arr = np.asarray(u, np.float32)
            if u_arr.ndim != 2 or u_arr.shape[0] != (self.cfg.model.u_dim
                                                     or 0):
                raise ValueError(
                    f"u must be [U={self.cfg.model.u_dim}][T], got "
                    f"{u_arr.shape}")
            if u_arr.shape[1] != T:
                raise ValueError("u and x time lengths must match")
            _require_finite_input(u_arr, "u")
            up = np.zeros((1, u_arr.shape[0], padded.shape[2]), np.float32)
            up[0, :, :T] = u_arr
            lengths = jnp.asarray(np.array([T], np.int32))
            # exact-inference modes run B=1 (row 0 carries the request;
            # the extra kernel-alignment rows are a mean-field concern)
            xp, upj = jnp.asarray(padded[:1]), jnp.asarray(up)
            if mode == "smoothed":
                g = self._smoothed(xp, upj, lengths)
            elif mode == "filtered":
                g = self._filtered(xp, upj, lengths)
            elif mode == "viterbi":
                states = self._viterbi(xp, upj, lengths)
                out["states"] = np.asarray(states)[0, :T].tolist()
                out["mode"] = mode
                return out
            else:
                raise ValueError(f"unknown mode {mode!r}")
            g_r = np.asarray(g)[0, :, :T]
            require_finite_output(g_r)
            out["regime_probs"] = g_r.tolist()
            out["mode"] = mode
        return out

    def predict(self, x: List[List[float]]):
        """Portfolio weights from the regime posterior — the working
        equivalent of the reference's broken Flask /predict (api.py:18
        calls a method that does not exist; SURVEY.md section 4.1).

        Uses the configured portfolio head; without a head checkpoint the
        head is deterministic-random (documented demo behaviour)."""
        jnp = self._jnp
        padded, T = self._padded(x)
        _, _, q = self._infer(jnp.asarray(padded), T,
                              self._bucket_use_pallas(padded.shape[2]))
        head, head_params = self._get_head()
        weights = head(head_params, jnp.asarray(np.asarray(q)[:, :, :T]))
        w_r = np.asarray(weights)[0]
        q_r = np.asarray(q)[0, :, T - 1]
        require_finite_output(w_r, q_r)
        return {"weights": w_r.tolist(), "regime_probs": q_r.tolist()}

    def stream(self, session: str, x_t=None, u_t=None,
               finish: bool = False, state=None, carry_state: bool = False):
        """Streaming filtered-posterior session (models/online.py): POST a
        frame at a time, get settled columns (2-frame encoder lag) plus a
        provisional peek for the newest frame.  finish=True flushes the
        tail and closes the session.

        Multi-worker: carry_state=True returns the serialized filter
        state in the response; a client that posts it back (`state`) may
        hit any worker — an unknown session resumes from the carried
        state bit-identically.  `new_session` in the response flags a
        fresh filter (e.g. TTL-expired session id) so clients detect
        resets explicitly."""
        if not isinstance(session, str) or not session:
            raise ValueError("field 'session' (non-empty string) required")
        if x_t is None and not finish:
            raise ValueError("field 'x_t' required (or finish=true)")
        if x_t is not None:
            x_arr = np.asarray(x_t, np.float32)
            if x_arr.shape != (self.cfg.model.input_dim,):
                raise ValueError(
                    f"x_t must be [C={self.cfg.model.input_dim}] floats, "
                    f"got shape {x_arr.shape}")
            u_arr = np.asarray(u_t, np.float32) if u_t is not None else None
            if u_arr is None or u_arr.shape != (self.cfg.model.u_dim or 0,):
                raise ValueError(
                    f"u_t must be [U={self.cfg.model.u_dim}] floats")
            # rejected BEFORE the filter update: one non-finite frame
            # would poison the session's alpha recursion forever
            _require_finite_input(x_arr, "x_t")
            _require_finite_input(u_arr, "u_t")
        else:
            x_arr = u_arr = None
        if state is not None and not isinstance(state, dict):
            raise ValueError("field 'state' must be an exported "
                             "session-state object")
        return self._streams.update(session, x_arr, u_arr, finish=finish,
                                    state=state,
                                    carry_state=bool(carry_state))

    def _get_head(self):
        if not hasattr(self, "_head_state"):
            # SINGLE atomic assignment: the threaded servers can race
            # two first /predict calls, and a two-field lazy init let a
            # reader observe _head without _head_params (the same hazard
            # the eager _streams comment documents); the worst case now
            # is both threads building an identical tuple, last wins
            self._head_state = load_portfolio_head(self.cfg)
        return self._head_state


def load_portfolio_head(cfg):
    """(head, head_params) from the config: the configured portfolio
    head with its checkpoint loaded — reference .pt head checkpoints
    (family from state_dict naming, dims from the weights) or the
    framework's .npz; random-init (with a stderr warning if a path was
    configured) otherwise.  Shared by the VAE and VQ serving families."""
    import jax

    from ..models.portfolio import HeadConfig, RegimePortfolioOptimizer

    head = RegimePortfolioOptimizer(HeadConfig(
        K=cfg.model.K, n_assets=cfg.portfolio.n_assets,
        hidden_dim=cfg.portfolio.hidden_dim))
    head_ckpt = cfg.head_checkpoint_path
    if str(head_ckpt or "").endswith((".pt", ".pth")) \
            and os.path.exists(str(head_ckpt)):
        # reference torch head checkpoints (models/portfolio.pt /
        # portfolio_improved.pt): family from state_dict naming,
        # dims from the weights (inference.py:15-17 workflow)
        import numpy as np

        from ..models.portfolio import ImprovedPortfolioOptimizer
        from ..utils.torch_interop import (
            head_params_from_state_dict, load_torch_file)

        head_params = head_params_from_state_dict(
            load_torch_file(str(head_ckpt)))
        w1 = np.asarray(head_params["fc1"]["weight"])
        if w1.ndim == 3:
            hc = HeadConfig(
                K=w1.shape[0], hidden_dim=w1.shape[1],
                n_assets=np.asarray(
                    head_params["fc3"]["weight"]).shape[1])
            head = ImprovedPortfolioOptimizer(hc)
        else:
            hc = HeadConfig(
                K=w1.shape[1], hidden_dim=w1.shape[0],
                n_assets=np.asarray(
                    head_params["fc3"]["weight"]).shape[0])
            head = RegimePortfolioOptimizer(hc)
        if hc.K != cfg.model.K:
            raise ValueError(
                f"head checkpoint {head_ckpt!r} has K={hc.K} but "
                f"the model serves K={cfg.model.K}")
        return head, head_params
    # accept the path verbatim OR with the implicit .npz suffix —
    # the same rule as the main checkpoint above (configuring
    # "head.npz" must not probe "head.npz.npz", miss, and silently
    # serve a random-init head)
    npz = str(head_ckpt) if str(head_ckpt or "").endswith(".npz") \
        else str(head_ckpt or "") + ".npz"
    if head_ckpt and os.path.exists(npz):
        from ..data.checkpoint import (load_params_npz,
                                       validate_params_for)

        head_params = load_params_npz(npz)
        validate_params_for(head, head_params,
                            what=f"head checkpoint {head_ckpt!r}")
    else:
        head_params = head.init(jax.random.PRNGKey(0))
        if head_ckpt:
            import sys

            print(f"WARNING: head_checkpoint_path {head_ckpt!r} is "
                  "configured but no checkpoint was found; /predict "
                  "serves a random-init head", file=sys.stderr,
                  flush=True)
    return head, head_params


def _env_batch_opts():
    """Micro-batching options from the VQHMM_* env knobs, or None."""
    if os.environ.get("VQHMM_BATCH", "") in ("", "0"):
        return None
    lengths = os.environ.get("VQHMM_WARMUP_LENGTHS", "200")
    max_queue = os.environ.get("VQHMM_MAX_QUEUE", "")
    return {"max_batch": int(os.environ.get("VQHMM_MAX_BATCH", "16")),
            "max_wait_ms": float(os.environ.get("VQHMM_MAX_WAIT_MS", "2")),
            "max_queue": int(max_queue) if max_queue else None,
            "pipeline_depth": int(os.environ.get("VQHMM_PIPELINE_DEPTH",
                                                 "2")),
            "warmup_lengths": tuple(int(v) for v in lengths.split(","))
            if lengths else ()}


def _build_model(config_path: str, batch_opts: Optional[dict] = None):
    """One fully-initialized serving model: InferenceModel, optionally
    wrapped in the micro-batcher + warmed.  batch_opts comes from
    ModelHandle.configure_batching (the `--batch` CLI path) and falls
    back to the VQHMM_* env knobs."""
    from ..core.config import load_config

    opts = batch_opts if batch_opts is not None else _env_batch_opts()
    if load_config(config_path).model.family == "vqvae":
        # the true-VQ family: codes + regime posteriors (serve/vq.py);
        # same /infer//predict routes on all three surfaces
        from .vq import VQInferenceModel

        if opts:
            import sys

            print("WARNING: micro-batching is a vae-family feature; "
                  "serving the vqvae family solo", file=sys.stderr,
                  flush=True)
        return VQInferenceModel(config_path)
    model = InferenceModel(config_path)
    if opts:
        from .batching import BatchingModel

        model = BatchingModel(model, max_batch=opts["max_batch"],
                              max_wait_ms=opts["max_wait_ms"],
                              max_queue=opts.get("max_queue"),
                              pipeline_depth=opts.get("pipeline_depth", 2))
        if opts["warmup_lengths"]:
            model.warmup(opts["warmup_lengths"])
    return model


class ModelHandle:
    """Stable per-config handle every serving surface holds; `reload()`
    swaps in freshly-loaded weights with zero downtime.

    Why a whole new inner model instead of assigning `self.params`: the
    jitted closures capture params as TRACE CONSTANTS (they are not call
    arguments — see InferenceModel._infer), so an in-place param swap
    would keep serving the OLD weights out of the cached executables.
    reload() therefore re-reads the config, builds and validates a
    complete model (same checkpoint validation as startup; under
    VQHMM_BATCH also a fresh warmed micro-batcher), then swaps the inner
    reference atomically — in-flight requests finish on the old model,
    every later request sees the new one, and a FAILED build leaves the
    old model serving untouched.

    Worker-local streaming sessions do not survive a reload (the swap is
    a logical worker restart); clients using carry_state=true resume
    seamlessly, exactly as across worker fan-out (docs/serving.md)."""

    def __init__(self, config_path: str):
        self._config_path = config_path
        self._reload_lock = threading.Lock()
        self._batch_opts: Optional[dict] = None  # configure_batching
        self._inner = _build_model(config_path)

    def __getattr__(self, name):
        # delegate everything (infer/predict/stream/cfg/params/close/...);
        # lookup happens per call, so a swapped inner takes effect
        # immediately for every caller holding this handle
        if name == "_inner":  # partially-constructed handle (build raised)
            raise AttributeError(name)
        return getattr(self._inner, name)

    def configure_batching(self, max_batch: int = 16,
                           max_wait_ms: float = 2.0,
                           warmup_lengths=(200,),
                           max_queue: Optional[int] = None,
                           pipeline_depth: int = 2) -> None:
        """Micro-batch this handle now AND on every future reload — the
        programmatic twin of VQHMM_BATCH, used by httpd.serve(batch=True)
        so a reload rebuilds (and re-warms) the batcher instead of
        silently downgrading to solo dispatches."""
        from .batching import BatchingModel

        if getattr(self._inner.cfg.model, "family", "vae") == "vqvae":
            import sys

            print("WARNING: micro-batching is a vae-family feature; "
                  "--batch ignored for the vqvae family", file=sys.stderr,
                  flush=True)
            return
        with self._reload_lock:
            self._batch_opts = {"max_batch": max_batch,
                                "max_wait_ms": max_wait_ms,
                                "max_queue": max_queue,
                                "pipeline_depth": pipeline_depth,
                                "warmup_lengths": tuple(warmup_lengths
                                                        or ())}
            inner = self._inner
            if getattr(inner, "is_batching", False) and inner.stopped:
                # a caller close()d the shared batcher (e.g. the
                # documented server teardown); unwrap the dead dispatcher
                # and rebuild rather than wrapping or reusing it
                inner = inner._inner
            if getattr(inner, "is_batching", False):
                # live dispatcher: apply the new settings in place (an
                # env-batched handle given --batch flags must not
                # silently keep its old max_queue/max_wait)
                inner.reconfigure(max_batch=max_batch,
                                  max_wait_ms=max_wait_ms,
                                  max_queue=max_queue)
            else:
                # pipeline_depth applies at build time (the dispatch
                # pool's size); reconfigure() of a LIVE dispatcher keeps
                # its pool — reload()/rebuild picks the new depth up
                inner = BatchingModel(inner, max_batch=max_batch,
                                      max_wait_ms=max_wait_ms,
                                      max_queue=max_queue,
                                      pipeline_depth=pipeline_depth)
            self._inner = inner
            if self._batch_opts["warmup_lengths"]:
                self._inner.warmup(self._batch_opts["warmup_lengths"])

    def reload(self) -> dict:
        """Build + validate a fresh model from the (re-read) config and
        atomically swap it in; raises WITHOUT swapping if the build fails.
        Concurrent reloads serialize."""
        with self._reload_lock:
            try:
                new = _build_model(self._config_path, self._batch_opts)
            except Exception:
                # a failed build may have re-bound the /metrics gauges to
                # the discarded candidate (InferenceModel.bind_metrics
                # runs during construction); restore them to the model
                # that is still serving, and let the candidate collect
                self._inner.bind_metrics()
                raise
            old, self._inner = self._inner, new
        if getattr(old, "is_batching", False):
            # retire the old dispatcher AFTER letting its queued requests
            # finish — in-flight work completes on the old model
            old.close(drain=True)
        return {"reloaded": True,
                "checkpoint_loaded": bool(new.checkpoint_loaded),
                "batching": bool(getattr(new, "is_batching", False))}


def reload_gate(token: Optional[str]):
    """Shared /admin/reload gate for all three surfaces: None if the
    request may proceed, else an (http_status, payload) denial.  The
    route only exists when VQHMM_ENABLE_RELOAD is set (a mutating admin
    endpoint must be opt-in), and VQHMM_RELOAD_TOKEN additionally
    requires a matching X-Reload-Token header."""
    if os.environ.get("VQHMM_ENABLE_RELOAD", "") in ("", "0"):
        return 404, {"detail": "not found"}
    want = os.environ.get("VQHMM_RELOAD_TOKEN", "")
    if want and not hmac.compare_digest(str(token or ""), want):
        return 403, {"detail": "bad reload token"}
    return None


@lru_cache(maxsize=1)
def get_model(config_path: str = "inference_config.json"):
    """Process-wide model handle shared by all serving surfaces.

    VQHMM_BATCH=1 wraps the model in the micro-batcher
    (serve/batching.py) so the FastAPI/ASGI/stdlib servers all coalesce
    concurrent /infer requests — the env knob lets Docker/k8s turn it on
    without code (VQHMM_MAX_BATCH, VQHMM_MAX_WAIT_MS,
    VQHMM_WARMUP_LENGTHS tune it).  The returned ModelHandle is a
    transparent proxy; `handle.reload()` (POST /admin/reload when
    VQHMM_ENABLE_RELOAD=1) hot-swaps new checkpoint weights with zero
    downtime."""
    return ModelHandle(config_path)


def create_app(config_path: str = "inference_config.json"):
    """Build the FastAPI app (import-gated so the core library never
    requires fastapi)."""
    import time as _time

    from fastapi import FastAPI, HTTPException, Request, Response
    from pydantic import BaseModel

    from .metrics import CONTENT_TYPE as _METRICS_CT
    from .metrics import METRICS

    app = FastAPI(title="vqvaehmm-tpu inference")

    class InferRequest(BaseModel):
        x: List[List[float]]
        u: Optional[List[List[float]]] = None
        mode: str = "mean_field"

    @app.middleware("http")
    async def _observe(request, call_next):
        # request counts + latency for every route except the scrape
        # itself (Prometheus convention: the collector's own traffic is
        # not a serving signal)
        if request.url.path == "/metrics":
            return await call_next(request)
        t0 = _time.perf_counter()
        # same body bound as the other two surfaces (httpd/asgi _MAX_BODY
        # = 64 MB): uvicorn itself imposes none, and a declared oversized
        # body should be refused before it is read
        if declared_body_too_large(request.headers.get("content-length")):
            resp = Response(content='{"detail": "request body too large"}',
                            status_code=413,
                            media_type="application/json")
        else:
            resp = await call_next(request)
        METRICS.observe_request(request.url.path, resp.status_code,
                                _time.perf_counter() - t0)
        return resp

    @app.get("/metrics")
    def metrics():
        return Response(content=METRICS.render(), media_type=_METRICS_CT)

    @app.get("/health")
    def health():
        return {"status": "ok"}

    from .batching import ServerBusy

    @app.post("/infer")
    def infer(req: InferRequest):
        try:
            return get_model(config_path).infer(req.x, u=req.u,
                                                mode=req.mode)
        except ValueError as e:
            raise HTTPException(status_code=400, detail=str(e))
        except ServerBusy as e:  # shed load; tell clients to back off
            raise HTTPException(status_code=503, detail=str(e),
                                headers={"Retry-After": "1"})
        except Exception as e:  # parity with reference's 500 (:74-75)
            raise HTTPException(status_code=500, detail=str(e))

    @app.post("/predict")
    def predict(req: InferRequest):
        try:
            return get_model(config_path).predict(req.x)
        except ValueError as e:
            raise HTTPException(status_code=400, detail=str(e))
        except Exception as e:
            raise HTTPException(status_code=500, detail=str(e))

    @app.post("/admin/reload")
    def admin_reload(request: Request):
        # zero-downtime checkpoint hot-swap (ModelHandle.reload); opt-in
        # via VQHMM_ENABLE_RELOAD (+ VQHMM_RELOAD_TOKEN) — reload_gate
        denied = reload_gate(request.headers.get("x-reload-token"))
        if denied:
            raise HTTPException(status_code=denied[0],
                                detail=denied[1]["detail"])
        try:
            return get_model(config_path).reload()
        except Exception as e:  # failed build: old model keeps serving
            raise HTTPException(status_code=500,
                                detail=f"reload failed: {e}")

    class StreamRequest(BaseModel):
        session: str
        x_t: Optional[List[float]] = None
        u_t: Optional[List[float]] = None
        finish: bool = False
        state: Optional[dict] = None
        carry_state: bool = False

    @app.post("/stream")
    def stream(req: StreamRequest):
        # NOTE: stream sessions are per-PROCESS state.  Under a
        # multi-worker server (gunicorn -w N) consecutive frames of one
        # session land on different workers; clients that set
        # carry_state=true and echo the returned `state` back survive
        # worker fan-out with no affinity (docs/serving.md "Streaming
        # sessions"); otherwise run single-worker or session-affine.
        try:
            return get_model(config_path).stream(
                req.session, x_t=req.x_t, u_t=req.u_t, finish=req.finish,
                state=req.state, carry_state=req.carry_state)
        except ValueError as e:
            raise HTTPException(status_code=400, detail=str(e))
        except Exception as e:
            raise HTTPException(status_code=500, detail=str(e))

    if os.environ.get("VQHMM_BATCH", "") not in ("", "0"):
        # eager init: build the model and warm the batch ladder at app
        # construction (worker boot), BEFORE the server starts accepting
        # traffic — otherwise the first request to each worker pays every
        # compile and the readiness probe lies.
        try:
            get_model(config_path)
        except Exception:
            # missing/incomplete config: fall back to lazy init (the
            # first request surfaces the real error); lru_cache does not
            # cache exceptions, so the retry is clean
            pass

    return app


# module-level app for `uvicorn vqvaehmm_tpu.serve.app:app`
try:
    import fastapi  # noqa: F401

    app = create_app(os.environ.get("VQHMM_INFERENCE_CONFIG",
                                    "inference_config.json"))
except Exception:  # fastapi missing: library use still works
    app = None
