"""Delta-hedging model zoo (reference: delta_hedger.py:7-183).

Five hedgers consuming regime posteriors; same functional convention as
models/portfolio.py.  KNOWN DEVIATION: the reference's DynamicDeltaHedger
carries Dropout(0.1) that IS active during its training
(delta_hedger.py:46,207 — hedger.train()); here dropout is identity in
training too (deterministic functional training; adding it would need a
PRNG threaded through train_delta_hedger).  Inference semantics match
exactly; trained-weight trajectories may differ by the missing
regularization.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn as ops
from ..ops.rnn import init_lstm, lstm
from .portfolio import HeadConfig, _as_seq, _last_step

Params = Dict


class RegimeDeltaHedger:
    """Delta MLP on [q, position] gated by a sigmoid uncertainty net;
    hedge = -delta * uncertainty * position (reference :7-34)."""

    def __init__(self, cfg: HeadConfig):
        self.cfg = cfg

    def init(self, key) -> Params:
        c = self.cfg
        k = jax.random.split(key, 5)
        return {
            "delta1": ops.init_linear(k[0], c.K + c.n_assets, c.hidden_dim),
            "delta2": ops.init_linear(k[1], c.hidden_dim, c.hidden_dim),
            "delta3": ops.init_linear(k[2], c.hidden_dim, c.n_assets),
            "unc1": ops.init_linear(k[3], c.K, c.hidden_dim // 2),
            "unc2": ops.init_linear(k[4], c.hidden_dim // 2, 1),
        }

    def __call__(self, params, regime_probs, spot_prices, portfolio_pos
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        q = _last_step(regime_probs)
        feat = jnp.concatenate([q, portfolio_pos], axis=-1)
        h = jax.nn.relu(ops.linear(params["delta1"], feat))
        h = jax.nn.relu(ops.linear(params["delta2"], h))
        delta = jnp.tanh(ops.linear(params["delta3"], h))
        u = jax.nn.relu(ops.linear(params["unc1"], q))
        uncertainty = jax.nn.sigmoid(ops.linear(params["unc2"], u))
        hedge = -(delta * uncertainty) * portfolio_pos
        return hedge, delta


class DynamicDeltaHedger:
    """Delta + optional gamma nets on [q, pos, spot(, gamma)]
    (reference :37-76)."""

    def __init__(self, cfg: HeadConfig, use_gamma: bool = True):
        self.cfg = cfg
        self.use_gamma = use_gamma

    def _input_dim(self):
        c = self.cfg
        return c.K + c.n_assets * 2 + (c.n_assets if self.use_gamma else 0)

    def init(self, key) -> Params:
        c = self.cfg
        k = jax.random.split(key, 5)
        d = self._input_dim()
        p = {
            "delta1": ops.init_linear(k[0], d, c.hidden_dim),
            "delta2": ops.init_linear(k[1], c.hidden_dim, c.hidden_dim),
            "delta3": ops.init_linear(k[2], c.hidden_dim, c.n_assets),
        }
        if self.use_gamma:
            p["gamma1"] = ops.init_linear(k[3], d, c.hidden_dim)
            p["gamma2"] = ops.init_linear(k[4], c.hidden_dim, c.n_assets)
        return p

    def __call__(self, params, regime_probs, spot_prices, portfolio_pos,
                 gamma: Optional[jnp.ndarray] = None):
        q = _last_step(regime_probs)
        feats = [q, portfolio_pos, spot_prices]
        if self.use_gamma:
            if gamma is None:
                # params were sized for the gamma feature (init, :66);
                # silently dropping it would fail later as an opaque
                # matmul shape error (the reference crashes the same way)
                raise ValueError(
                    "DynamicDeltaHedger(use_gamma=True) requires gamma=; "
                    "construct with use_gamma=False to hedge without it")
            feats.append(gamma)
        x = jnp.concatenate(feats, axis=-1)
        h = jax.nn.relu(ops.linear(params["delta1"], x))
        h = jax.nn.relu(ops.linear(params["delta2"], h))
        delta = ops.linear(params["delta3"], h)
        if self.use_gamma:
            g = jax.nn.relu(ops.linear(params["gamma1"], x))
            gamma_hedge = ops.linear(params["gamma2"], g)
            total = delta + 0.5 * gamma_hedge * spot_prices
        else:
            total = delta
        return total, delta


class LSTMDeltaHedger:
    """LSTM over [regime path, price path] -> tanh hedge ratios
    (reference :79-92)."""

    def __init__(self, cfg: HeadConfig, num_layers: int = 2,
                 lookback: int = 10):
        self.cfg = cfg
        self.num_layers = num_layers
        self.lookback = lookback

    def init(self, key) -> Params:
        c = self.cfg
        k1, k2 = jax.random.split(key)
        return {"lstm": init_lstm(k1, c.K + c.n_assets, c.hidden_dim,
                                  self.num_layers),
                "head": ops.init_linear(k2, c.hidden_dim, c.n_assets)}

    def __call__(self, params, regime_seq, price_seq):
        seq = _as_seq(regime_seq, self.cfg.K)
        T = seq.shape[1]
        # price_seq arrives channels-first (B, C, T) from the in-repo
        # trainer (train/heads.py) or time-major (B, T, C); when C == T
        # the layouts are indistinguishable and we resolve the square
        # case CHANNELS-FIRST (transpose) — the documented caller
        # contract — where the old sniff silently kept the wrong layout
        if price_seq.shape[1] != T or price_seq.shape[2] == T:
            price_seq = jnp.transpose(price_seq, (0, 2, 1))
        combined = jnp.concatenate([seq, price_seq], axis=-1)
        out, _ = lstm(params["lstm"], combined)
        return jnp.tanh(ops.linear(params["head"], out[:, -1]))


class TransactionCostAwareHedger:
    """Hedge net + learned rehedge threshold: only rehedges when deviation
    exceeds threshold*0.1; returns (new_hedge, cost) (reference :120-152)."""

    def __init__(self, cfg: HeadConfig, tx_cost: float = 0.001):
        self.cfg = cfg
        self.tx_cost = tx_cost

    def init(self, key) -> Params:
        c = self.cfg
        k = jax.random.split(key, 4)
        return {
            "hedge1": ops.init_linear(k[0], c.K + c.n_assets * 2, c.hidden_dim),
            "hedge2": ops.init_linear(k[1], c.hidden_dim, c.n_assets),
            "thresh1": ops.init_linear(k[2], c.K, c.hidden_dim // 2),
            "thresh2": ops.init_linear(k[3], c.hidden_dim // 2, 1),
        }

    def __call__(self, params, regime_probs, current_hedge, target_delta,
                 spot_prices):
        q = _last_step(regime_probs)
        feat = jnp.concatenate([q, current_hedge, spot_prices], axis=-1)
        h = jax.nn.relu(ops.linear(params["hedge1"], feat))
        optimal = ops.linear(params["hedge2"], h)
        t = jax.nn.relu(ops.linear(params["thresh1"], q))
        threshold = jax.nn.sigmoid(ops.linear(params["thresh2"], t)) * 0.1
        deviation = jnp.abs(optimal - current_hedge)
        rehedge = (deviation > threshold).astype(optimal.dtype)
        new_hedge = current_hedge + (optimal - current_hedge) * rehedge
        trade = jnp.abs(new_hedge - current_hedge)
        cost = self.tx_cost * trade * spot_prices
        return new_hedge, cost.sum(axis=-1)


class TransitionAwareHedger:
    """Rolls q forward `lookahead` steps via the last transition matrix and
    hedges on the concatenated future path (reference :155-183)."""

    def __init__(self, cfg: HeadConfig, lookahead: int = 5):
        self.cfg = cfg
        self.lookahead = lookahead

    def init(self, key) -> Params:
        c = self.cfg
        k = jax.random.split(key, 3)
        d = c.K * (self.lookahead + 1) + c.n_assets
        return {
            "fc1": ops.init_linear(k[0], d, c.hidden_dim),
            "fc2": ops.init_linear(k[1], c.hidden_dim, c.hidden_dim),
            "fc3": ops.init_linear(k[2], c.hidden_dim, c.n_assets),
        }

    def __call__(self, params, regime_probs, trans_matrix, spot_prices):
        q = _last_step(regime_probs)
        A_last = trans_matrix[:, -1, :, :]  # (B,K,K)

        def roll(p, _):
            nxt = jnp.einsum("bk,bkj->bj", p, A_last)
            return nxt, nxt

        _, future = lax.scan(roll, q, None, length=self.lookahead)
        all_probs = jnp.concatenate(
            [q] + [future[i] for i in range(self.lookahead)], axis=-1)
        feat = jnp.concatenate([all_probs, spot_prices], axis=-1)
        h = jax.nn.relu(ops.linear(params["fc1"], feat))
        h = jax.nn.relu(ops.linear(params["fc2"], h))
        return jnp.tanh(ops.linear(params["fc3"], h))
