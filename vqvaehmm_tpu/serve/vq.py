"""Serving surface for the true-VQ family (model.family: vqvae).

Binds a trained VQStack archive (train/vq_pipeline.py) to the same
/infer and /predict routes the VAE family serves on all three HTTP
surfaces (FastAPI / ASGI / stdlib — serve/app._build_model dispatches
on the config's model.family).  The response carries what the VQ stack
uniquely offers: the discrete code indices per timestep plus exact
regime posteriors from the categorical-emission HMM over those codes —
the serving realization of the reference's design sketch
(reference: pseudocode.txt:1-32, which never had any serving at all).

Contract:

    POST /infer {"x": [[C rows of T floats]], "mode"?: "smoothed" |
                 "filtered" | "viterbi"}
      -> {"codes": [T ints], "regime_probs": [[K rows of T floats]],
          "mode": ...}                      (viterbi: "states" instead)
    POST /predict {"x": ...} -> {"weights": [...], "regime_probs": [...]}

`u` is accepted and ignored (the VQ prior is the code-HMM itself; the
VAE family's input-conditioned transitions have no VQ analog).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .app import (DEFAULT_BUCKETS, _require_finite_input,
                  load_portfolio_head, require_finite_output)


class VQInferenceModel:
    """Lazy singleton wrapping a jitted VQStack (the VQ twin of
    app.InferenceModel)."""

    is_batching = False

    def __init__(self, config_path: str = "inference_config.json"):
        import jax
        import jax.numpy as jnp

        from ..core.config import load_config
        from ..train.vq_pipeline import VQStack, make_vq_model

        self.cfg = load_config(config_path)
        ckpt = self.cfg.checkpoint_path
        npz = ckpt if (ckpt or "").endswith(".npz") else (ckpt or "") + ".npz"
        loaded = False
        if ckpt and os.path.exists(npz):
            self.stack = VQStack.load(npz)
            loaded = True
            vcfg = self.stack.model.cfg
            if vcfg.input_dim != self.cfg.model.input_dim:
                raise ValueError(
                    f"archive {npz!r} expects input_dim={vcfg.input_dim} "
                    f"but the config serves {self.cfg.model.input_dim}")
            if self.stack.hmm.K != self.cfg.model.K:
                raise ValueError(
                    f"archive {npz!r} carries a K={self.stack.hmm.K} "
                    f"regime HMM but the config serves K="
                    f"{self.cfg.model.K}")
            if vcfg.num_codes != self.cfg.vq.num_codes:
                raise ValueError(
                    f"archive {npz!r} holds a {vcfg.num_codes}-code "
                    f"codebook but the config declares vq.num_codes="
                    f"{self.cfg.vq.num_codes} — clients sizing code "
                    "histograms from the config would disagree with "
                    "what is served")
            if vcfg.latent_dim != self.cfg.vq.latent_dim:
                raise ValueError(
                    f"archive {npz!r} uses latent_dim={vcfg.latent_dim} "
                    f"but the config declares vq.latent_dim="
                    f"{self.cfg.vq.latent_dim}")
        else:
            # demo behaviour mirroring the VAE surface: random-init VQ
            # params + a uniform code-HMM, with a loud warning (or a
            # hard failure under VQHMM_REQUIRE_CHECKPOINT=1)
            from ..models.hmm import CategoricalEmission, HiddenMarkovModel

            model = make_vq_model(self.cfg)
            params = model.init(jax.random.PRNGKey(0))
            K, V = self.cfg.model.K, self.cfg.vq.num_codes
            hmm = HiddenMarkovModel(np.full(K, 1.0 / K),
                                    np.full((K, K), 1.0 / K),
                                    CategoricalEmission(
                                        jnp.zeros((K, V), jnp.float32)))
            from ..train.vq_pipeline import VQStack as _S

            self.stack = _S(model, params, hmm, [])
            if ckpt:
                import sys

                msg = (f"checkpoint_path {ckpt!r} is configured but no "
                       "VQ archive was found; serving UNTRAINED "
                       "random-init weights")
                if os.environ.get("VQHMM_REQUIRE_CHECKPOINT",
                                  "") not in ("", "0"):
                    raise FileNotFoundError(msg)
                print(f"WARNING: {msg} (set VQHMM_REQUIRE_CHECKPOINT=1 "
                      "to fail instead)", file=sys.stderr, flush=True)
        self.checkpoint_loaded = loaded
        self._jnp = jnp

        stack = self.stack
        # jitted once per padding bucket (lengths is a traced arg), same
        # executable-reuse policy as the VAE surface
        self._codes = jax.jit(lambda x: stack.codes(x))
        self._smoothed = jax.jit(
            lambda x, lens: stack.regime_marginals(x, lens, "smoothed"))
        self._filtered = jax.jit(
            lambda x, lens: stack.regime_marginals(x, lens, "filtered"))
        self._viterbi = jax.jit(lambda x, lens: stack.viterbi(x, lens))
        self.bind_metrics()

    def bind_metrics(self) -> None:
        from .metrics import METRICS

        METRICS.register_gauge(
            "vqhmm_checkpoint_loaded",
            lambda: 1.0 if self.checkpoint_loaded else 0.0,
            "1 iff serving weights came from a checkpoint "
            "(0 = random init).")

    def _padded(self, x: List[List[float]]):
        with np.errstate(over="ignore"):
            arr = np.asarray(x, np.float32)
        C = self.cfg.model.input_dim
        if arr.ndim != 2 or arr.shape[0] != C:
            raise ValueError(
                f"x must be [C={C}][T] floats, got shape {arr.shape}")
        _require_finite_input(arr, "x")
        T = arr.shape[1]
        pad_to = next((b for b in DEFAULT_BUCKETS if b >= T), T)
        padded = np.zeros((1, C, pad_to), np.float32)
        padded[0, :, :T] = arr
        return padded, T

    def infer(self, x: List[List[float]],
              u: Optional[List[List[float]]] = None,
              mode: str = "smoothed"):
        """codes + regime posterior.  mode: 'smoothed' (default,
        all-data) | 'filtered' (causal) | 'viterbi' (MAP path as
        "states").  'mean_field' maps to 'smoothed' so VAE-family
        clients can switch stacks without editing request bodies."""
        jnp = self._jnp
        if mode == "mean_field":
            mode = "smoothed"
        if mode not in ("smoothed", "filtered", "viterbi"):
            raise ValueError(f"unknown mode {mode!r}")
        padded, T = self._padded(x)
        lens = jnp.asarray(np.array([T], np.int32))
        xp = jnp.asarray(padded)
        codes = np.asarray(self._codes(xp))[0, :T]
        out = {"codes": codes.tolist(), "mode": mode}
        if mode == "viterbi":
            states = np.asarray(self._viterbi(xp, lens))[0, :T]
            out["states"] = states.tolist()
            return out
        fn = self._smoothed if mode == "smoothed" else self._filtered
        g = np.asarray(fn(xp, lens))[0, :T]          # (T, K)
        require_finite_output(g)
        out["regime_probs"] = g.T.tolist()           # (K, T) like the VAE
        return out

    def predict(self, x: List[List[float]]):
        """Portfolio weights from the smoothed regime posterior through
        the configured head (shared loader with the VAE surface)."""
        jnp = self._jnp
        padded, T = self._padded(x)
        lens = jnp.asarray(np.array([T], np.int32))
        g = np.asarray(self._smoothed(jnp.asarray(padded), lens))[0, :T]
        if not hasattr(self, "_head_state"):
            self._head_state = load_portfolio_head(self.cfg)
        head, head_params = self._head_state
        q = jnp.asarray(g.T[None])                   # (1, K, T)
        weights = head(head_params, q)
        w_r = np.asarray(weights)[0]
        q_r = g[T - 1]
        require_finite_output(w_r, q_r)
        return {"weights": w_r.tolist(), "regime_probs": q_r.tolist()}

    def stream(self, *args, **kwargs):
        raise ValueError(
            "streaming requires model.family=vae (the vqvae family has "
            "no incremental filter surface)")
