"""Regime-analysis utilities (reference: regime_utilities.py:1-176).

Models: RegimeChangeDetector, ForwardTransitionPredictor,
RegimePersistenceModel, TemperatureScaling, RegimeFactorModel.
Functions: calibrate_probabilities, estimate_regime_covariance,
confidence_based_sizing, optimize_rebalancing_frequency, optimize_leverage.

The reference's double Python loop over (B, K) in RegimeFactorModel
(regime_utilities.py:130-137) and the per-K covariance loop (:101-110)
become einsums — one fused contraction on the MXU.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import nn as ops
from ..ops.precise import plog_softmax, psoftmax
from ..ops.rnn import init_lstm, lstm
from .portfolio import _last_step


def _as_seq_unambiguous(q, K: int):
    """(B,K,T) -> (B,T,K) only when the layouts are distinguishable.

    The LSTM regime models' reference (regime_utilities.py:14-16,28-30)
    consumes (B, T, K) directly with NO layout sniff, so a square
    (B, K, K) input must pass through untransposed — unlike as_seq,
    whose square tie-break follows VQ_VAE_HMM_fixed.py's idiom."""
    if q.ndim == 3 and q.shape[1] == K and q.shape[2] != K:
        import jax.numpy as _jnp

        return _jnp.transpose(q, (0, 2, 1))
    return q

Params = Dict


class RegimeChangeDetector:
    """2-layer LSTM over the q path -> sigmoid P(regime change)
    (reference :7-17)."""

    def __init__(self, K: int, hidden_dim: int = 64):
        self.K = K
        self.hidden_dim = hidden_dim

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"lstm": init_lstm(k1, self.K, self.hidden_dim, 2),
                "fc": ops.init_linear(k2, self.hidden_dim, 1)}

    def __call__(self, params, regime_probs_seq):
        seq = _as_seq_unambiguous(regime_probs_seq, self.K)
        out, _ = lstm(params["lstm"], seq)
        return jax.nn.sigmoid(ops.linear(params["fc"], out[:, -1, :]))


class ForwardTransitionPredictor:
    """LSTM -> (B, n_steps, K) softmax multi-step regime forecast
    (reference :20-32)."""

    def __init__(self, K: int, n_steps: int = 5, hidden_dim: int = 64):
        self.K = K
        self.n_steps = n_steps
        self.hidden_dim = hidden_dim

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"lstm": init_lstm(k1, self.K, self.hidden_dim, 2),
                "fc": ops.init_linear(k2, self.hidden_dim,
                                      self.K * self.n_steps)}

    def __call__(self, params, regime_probs_seq):
        seq = _as_seq_unambiguous(regime_probs_seq, self.K)
        out, _ = lstm(params["lstm"], seq)
        logits = ops.linear(params["fc"], out[:, -1, :])
        logits = logits.reshape(-1, self.n_steps, self.K)
        return psoftmax(logits, axis=-1)


class RegimePersistenceModel:
    """Softplus duration MLP + diag(A)-weighted persistence
    (reference :35-53)."""

    def __init__(self, K: int, hidden_dim: int = 32):
        self.K = K
        self.hidden_dim = hidden_dim

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"fc1": ops.init_linear(k1, self.K, self.hidden_dim),
                "fc2": ops.init_linear(k2, self.hidden_dim, 1)}

    def __call__(self, params, regime_probs, transition_matrix):
        q = _last_step(regime_probs)
        self_trans = jnp.diagonal(transition_matrix, axis1=-2, axis2=-1)
        weighted = (q * self_trans).sum(-1, keepdims=True)
        h = jax.nn.relu(ops.linear(params["fc1"], q))
        duration = jax.nn.softplus(ops.linear(params["fc2"], h))
        return duration + weighted


class TemperatureScaling:
    """Single learned temperature calibrating regime logits
    (reference :76-94; LBFGS replaced by Adam on LOG-temperature, which
    reaches the same 1-parameter optimum — additive steps in log space
    are multiplicative in T, so optima far from the 1.0 init are
    reachable within the default budget, matching LBFGS's
    curvature-scaled reach).  The whole optimization is ONE jitted
    fori_loop dispatch, not max_iter host-driven steps."""

    def init(self) -> Params:
        return {"temperature": jnp.ones((1,))}

    def __call__(self, params, logits):
        return logits / params["temperature"]

    def calibrate(self, params, logits, labels, lr: float = 0.05,
                  max_iter: int = 200) -> Tuple[Params, float]:
        logits = jnp.asarray(logits)
        labels = jnp.asarray(labels)
        opt = optax.adam(lr)

        @jax.jit
        def run(log_t0):
            def loss_fn(log_t):
                lp = plog_softmax(logits / jnp.exp(log_t), axis=-1)
                return -jnp.take_along_axis(lp, labels[:, None], 1).mean()

            def body(_, carry):
                log_t, s = carry
                g = jax.grad(loss_fn)(log_t)
                updates, s = opt.update(g, s, log_t)
                return optax.apply_updates(log_t, updates), s

            log_t, _ = jax.lax.fori_loop(
                0, max_iter, body, (log_t0, opt.init(log_t0)))
            return log_t

        t = jnp.exp(run(jnp.log(params["temperature"])))
        return {"temperature": t}, float(t[0])


class RegimeFactorModel:
    """Per-regime factor loadings + specific risk -> prob-weighted covariance
    (reference :115-139); the (B, K) Python double loop is one einsum."""

    def __init__(self, K: int, n_assets: int, n_factors: int = 5):
        self.K = K
        self.n_assets = n_assets
        self.n_factors = n_factors

    def init(self, key) -> Params:
        return {
            "factor_loadings": jax.random.normal(
                key, (self.K, self.n_assets, self.n_factors)),
            "specific_risk": jnp.ones((self.K, self.n_assets)),
        }

    def get_covariance(self, params, regime_probs):
        q = _last_step(regime_probs)  # (B,K)
        F = params["factor_loadings"]
        cov_k = jnp.einsum("kaf,kcf->kac", F, F)
        cov_k = cov_k + jax.vmap(jnp.diag)(params["specific_risk"] ** 2)
        return jnp.einsum("bk,kac->bac", q, cov_k)


# ---------------------------------------------------------------------------
# Functions
# ---------------------------------------------------------------------------


def calibrate_probabilities(regime_probs, true_regimes,
                            n_bins: int = 10) -> List[Tuple[float, float]]:
    """Reliability-diagram binning (host-side numpy, reference :56-73)."""
    p = np.asarray(regime_probs)
    t = np.asarray(true_regimes)
    max_probs = p.max(axis=-1)
    pred = p.argmax(axis=-1)
    edges = np.linspace(0, 1, n_bins + 1)
    out = []
    for i in range(n_bins):
        m = (max_probs >= edges[i]) & (max_probs < edges[i + 1])
        if m.sum() > 0:
            out.append((float(max_probs[m].mean()),
                        float((pred[m] == t[m]).mean())))
    return out


def estimate_regime_covariance(returns, regime_probs, K: int) -> jnp.ndarray:
    """Per-regime weighted covariance (B,K,A,A) (reference :97-112);
    loop over K vectorized into einsums."""
    B, T, A = returns.shape
    rp = jnp.transpose(regime_probs, (0, 2, 1)) \
        if regime_probs.shape[1] == K else regime_probs  # (B,T,K)
    w = rp[:, :, :, None]                                # (B,T,K,1)
    wr = returns[:, :, None, :] * w                      # (B,T,K,A)
    wsum = jnp.maximum(w.sum(axis=1), 1e-8)              # (B,K,1)
    mean = wr.sum(axis=1) / wsum                         # (B,K,A)
    centered = wr - mean[:, None]                        # (B,T,K,A)
    cov = jnp.einsum("btka,btkc->bkac", centered, centered * w)
    return cov / wsum[:, :, :, None]


def confidence_based_sizing(weights, regime_probs,
                            min_confidence: float = 0.5,
                            max_scale: float = 1.5) -> jnp.ndarray:
    """Scale weights by normalized max-prob confidence (reference :142-153)."""
    q = _last_step(regime_probs)
    conf = q.max(axis=-1)
    norm = jnp.maximum(conf - min_confidence, 0.0) / (1 - min_confidence)
    scale = 1.0 + (max_scale - 1.0) * norm
    scaled = weights * scale[:, None]
    return scaled / scaled.sum(-1, keepdims=True)


def optimize_rebalancing_frequency(regime_probs, transition_probs, returns,
                                   transaction_cost: float = 0.001,
                                   max_freq: int = 21) -> jnp.ndarray:
    """sqrt(c / 2 sigma) * 252 clamped to [1, max_freq] (reference :156-165)."""
    vol = jnp.std(returns, axis=1, ddof=1).mean()
    freq = jnp.sqrt(transaction_cost / (2 * vol)) * 252
    return jnp.clip(freq, 1, max_freq).astype(jnp.int32)


def optimize_leverage(weights, returns, max_leverage: float = 2.0,
                      target_vol: float = 0.15) -> jnp.ndarray:
    """Vol-targeting multiplier capped at max_leverage (reference :168-176)."""
    pr = (weights[:, None, :] * returns).sum(-1)
    vol = jnp.std(pr, axis=1, ddof=1)
    mult = jnp.minimum(target_vol / vol, max_leverage)
    return weights * mult[:, None]
