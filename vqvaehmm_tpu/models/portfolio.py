"""Portfolio-optimizer zoo: eight architectures consuming regime posteriors.

Rebuilds every optimizer from the reference (portfolio_optimizer.py:7-98,
VQ_VAE_HMM_fixed.py:182-212, train_simple.py:31-60) as functional modules:
`Model(cfg).init(key) -> params`, `Model(cfg)(params, q, ...) -> weights`.

Shared input convention (the reference's dim-sniffing idiom,
portfolio_optimizer.py:15-18,32-33): regime probs arrive as (B, K) or
(B, K, T); sequence models consume the full (B, T, K) path, pointwise
models take the last timestep.

TPU notes: the ensemble's Python loop over member MLPs (reference
portfolio_optimizer.py:82) is a vmap over stacked parameters — one batched
matmul per layer instead of n_models small ones; Bayesian MC sampling draws
all n_samples at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import nn as ops
from ..ops.attention import (init_mha, init_transformer_encoder, mha,
                             transformer_encoder)
from ..ops.precise import psoftmax
from ..ops.rnn import init_lstm, lstm

Params = Dict


def _last_step(q: jnp.ndarray) -> jnp.ndarray:
    """(B,K,T) -> (B,K): take the final timestep (reference idiom).

    CONTRACT: 3-D input must be (B, K, T) — time LAST, the layout every
    model-side producer emits.  A (B, T, K) input is NOT sniffed here
    (the pointwise heads mirror the reference exactly); with T == K it
    would be indistinguishable anyway."""
    return q[:, :, -1] if q.ndim == 3 else q


def _as_seq(q: jnp.ndarray, K: int) -> jnp.ndarray:
    """(B,K,T)/(B,T,K) -> (B,T,K) — the shared reference sniff rule."""
    return ops.as_seq(q, K)


@dataclass(frozen=True)
class HeadConfig:
    K: int = 3
    n_assets: int = 10
    hidden_dim: int = 64


class RegimePortfolioOptimizer:
    """MLP K -> h -> h -> n_assets, softmax weights
    (reference: VQ_VAE_HMM_fixed.py:182-196)."""

    def __init__(self, cfg: HeadConfig):
        self.cfg = cfg

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        c = self.cfg
        return {"fc1": ops.init_linear(k1, c.K, c.hidden_dim),
                "fc2": ops.init_linear(k2, c.hidden_dim, c.hidden_dim),
                "fc3": ops.init_linear(k3, c.hidden_dim, c.n_assets)}

    def __call__(self, params: Params, regime_probs: jnp.ndarray):
        q = _last_step(regime_probs)
        h = jax.nn.relu(ops.linear(params["fc1"], q))
        h = jax.nn.relu(ops.linear(params["fc2"], h))
        return psoftmax(ops.linear(params["fc3"], h), axis=-1)


class AttentionPortfolioOptimizer:
    """Self-attention over the regime path, last token -> MLP
    (reference: portfolio_optimizer.py:7-20)."""

    def __init__(self, cfg: HeadConfig, n_heads: int = 1):
        # reference defaults n_heads=4, which torch rejects for K=3;
        # we default to 1 and validate in init_mha.
        self.cfg = cfg
        self.n_heads = n_heads

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        c = self.cfg
        return {"attn": init_mha(k1, c.K, self.n_heads),
                "fc1": ops.init_linear(k2, c.K, c.hidden_dim),
                "fc2": ops.init_linear(k3, c.hidden_dim, c.n_assets)}

    def __call__(self, params: Params, regime_probs: jnp.ndarray):
        if regime_probs.ndim == 3:
            seq = _as_seq(regime_probs, self.cfg.K)
            out = mha(params["attn"], seq, self.n_heads)
            q = out[:, -1, :]
        else:
            q = regime_probs
        h = jax.nn.relu(ops.linear(params["fc1"], q))
        return psoftmax(ops.linear(params["fc2"], h), axis=-1)


class TransformerPortfolioOptimizer:
    """2-layer transformer encoder (d_model=K), last-token head
    (reference: portfolio_optimizer.py:23-35)."""

    def __init__(self, cfg: HeadConfig, n_layers: int = 2, n_heads: int = 1):
        self.cfg = cfg
        self.n_layers = n_layers
        self.n_heads = n_heads

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        c = self.cfg
        return {
            "encoder": init_transformer_encoder(
                k1, c.K, self.n_heads, c.hidden_dim, self.n_layers),
            "head": ops.init_linear(k2, c.K, c.n_assets),
        }

    def __call__(self, params: Params, regime_seq: jnp.ndarray):
        if regime_seq.ndim == 2:  # (B,K) arrival shape: length-1 sequence
            regime_seq = regime_seq[:, None, :]
        seq = _as_seq(regime_seq, self.cfg.K)
        out = transformer_encoder(params["encoder"], seq, self.n_heads)
        return psoftmax(ops.linear(params["head"], out[:, -1]), axis=-1)


class BayesianPortfolioOptimizer:
    """Variational hidden layer, MC-averaged weights + uncertainty
    (reference: portfolio_optimizer.py:38-65)."""

    def __init__(self, cfg: HeadConfig, n_samples: int = 10):
        self.cfg = cfg
        self.n_samples = n_samples

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        c = self.cfg
        return {"fc1_mu": ops.init_linear(k1, c.K, c.hidden_dim),
                "fc1_logvar": ops.init_linear(k2, c.K, c.hidden_dim),
                "fc2": ops.init_linear(k3, c.hidden_dim, c.n_assets)}

    def __call__(self, params: Params, regime_probs: jnp.ndarray,
                 key: Optional[jax.Array] = None,
                 return_uncertainty: bool = False):
        if return_uncertainty and key is None:
            # the deterministic path has no MC spread; silently
            # returning bare weights made `w, unc = ...` unpack garbage
            raise ValueError(
                "return_uncertainty=True requires key= (MC sampling); "
                "the deterministic path has no uncertainty estimate")
        if return_uncertainty and self.n_samples < 2:
            raise ValueError(
                "uncertainty needs n_samples >= 2 (ddof=1 std over one "
                "sample is NaN)")
        q = _last_step(regime_probs)
        mu = jax.nn.relu(ops.linear(params["fc1_mu"], q))
        logvar = ops.linear(params["fc1_logvar"], q)
        if key is None:  # deterministic eval path (reference :65)
            return psoftmax(ops.linear(params["fc2"], mu), axis=-1)
        # all MC samples in one batched draw (reference loops :55-58)
        eps = jax.random.normal(key, (self.n_samples,) + mu.shape, mu.dtype)
        h = mu[None] + eps * jnp.exp(0.5 * logvar)[None]
        w = psoftmax(ops.linear(params["fc2"], h), axis=-1)  # (S,B,A)
        weights = w.mean(axis=0)
        if return_uncertainty:
            return weights, w.std(axis=0, ddof=1)
        return weights


class EnsemblePortfolioOptimizer:
    """n_models independent MLPs, averaged — vmapped over stacked params
    (reference: portfolio_optimizer.py:68-83)."""

    def __init__(self, cfg: HeadConfig, n_models: int = 5):
        self.cfg = cfg
        self.n_models = n_models

    def init(self, key) -> Params:
        c = self.cfg

        def one(k):
            k1, k2 = jax.random.split(k)
            return {"fc1": ops.init_linear(k1, c.K, c.hidden_dim),
                    "fc2": ops.init_linear(k2, c.hidden_dim, c.n_assets)}

        keys = jax.random.split(key, self.n_models)
        members = [one(k) for k in keys]
        return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *members)

    def __call__(self, params: Params, regime_probs: jnp.ndarray):
        q = _last_step(regime_probs)

        def member(p):
            h = jax.nn.relu(ops.linear(p["fc1"], q))
            return psoftmax(ops.linear(p["fc2"], h), axis=-1)

        return jax.vmap(member)(params).mean(axis=0)


class HierarchicalPortfolioOptimizer:
    """Macro MLP -> concat(q) -> micro MLP -> head
    (reference: portfolio_optimizer.py:86-98)."""

    def __init__(self, cfg: HeadConfig):
        self.cfg = cfg

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        c = self.cfg
        return {"macro": ops.init_linear(k1, c.K, c.hidden_dim),
                "micro": ops.init_linear(k2, c.hidden_dim + c.K, c.hidden_dim),
                "head": ops.init_linear(k3, c.hidden_dim, c.n_assets)}

    def __call__(self, params: Params, regime_probs: jnp.ndarray):
        q = _last_step(regime_probs)
        macro = jax.nn.relu(ops.linear(params["macro"], q))
        micro = jax.nn.relu(ops.linear(params["micro"],
                                       jnp.concatenate([macro, q], -1)))
        return psoftmax(ops.linear(params["head"], micro), axis=-1)


class RegimeLSTMOptimizer:
    """2-layer LSTM over regime path, last hidden -> softmax weights
    (reference: VQ_VAE_HMM_fixed.py:204-212)."""

    def __init__(self, cfg: HeadConfig, num_layers: int = 2):
        self.cfg = cfg
        self.num_layers = num_layers

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        c = self.cfg
        return {"lstm": init_lstm(k1, c.K, c.hidden_dim, self.num_layers),
                "head": ops.init_linear(k2, c.hidden_dim, c.n_assets)}

    def __call__(self, params: Params, regime_seq: jnp.ndarray):
        seq = _as_seq(regime_seq, self.cfg.K)
        out, _ = lstm(params["lstm"], seq)
        return psoftmax(ops.linear(params["head"], out[:, -1]), axis=-1)


class ImprovedPortfolioOptimizer:
    """Per-regime MLP bank — Linear(K,h) > ReLU > Dropout > Linear(h,h) >
    ReLU > Dropout > Linear(h,A) per regime — probability-weighted mixture
    of softmax weights (reference: train_simple.py:31-60); the per-regime
    loop is a vmap.

    Dropout (rate 0.2, train_simple.py:42,45) is active only when `key` is
    passed (training); the default keyless call is deterministic, matching
    the reference's `.eval()` inference mode (inference.py:17).  The param
    layout loads the reference's shipped `models/portfolio_improved.pt`
    via utils.torch_interop.improved_head_params_from_state_dict."""

    dropout_rate = 0.2

    def __init__(self, cfg: HeadConfig):
        self.cfg = cfg

    def init(self, key) -> Params:
        c = self.cfg

        def one(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {"fc1": ops.init_linear(k1, c.K, c.hidden_dim),
                    "fc2": ops.init_linear(k2, c.hidden_dim, c.hidden_dim),
                    "fc3": ops.init_linear(k3, c.hidden_dim, c.n_assets)}

        keys = jax.random.split(key, c.K)
        return jax.tree_util.tree_map(lambda *a: jnp.stack(a),
                                      *[one(k) for k in keys])

    def __call__(self, params: Params, regime_probs: jnp.ndarray,
                 *, key=None):
        q = _last_step(regime_probs)  # (B,K)

        def drop(h, k):
            if k is None:
                return h
            keep = jax.random.bernoulli(k, 1.0 - self.dropout_rate, h.shape)
            return jnp.where(keep, h / (1.0 - self.dropout_rate), 0.0)

        def expert(p, ks):
            k1, k2 = (None, None) if ks is None else (ks[0], ks[1])
            h = drop(jax.nn.relu(ops.linear(p["fc1"], q)), k1)
            h = drop(jax.nn.relu(ops.linear(p["fc2"], h)), k2)
            return psoftmax(ops.linear(p["fc3"], h), axis=-1)

        if key is None:
            w = jax.vmap(lambda p: expert(p, None))(params)  # (K,B,A)
        else:
            keys = jax.random.split(key, (self.cfg.K, 2))
            w = jax.vmap(expert)(params, keys)
        return jnp.einsum("kba,bk->ba", w, q)
