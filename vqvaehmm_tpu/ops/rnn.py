"""LSTM as a lax.scan recurrence (torch nn.LSTM semantics, batch_first).

Used by the sequential downstream models (reference: RegimeLSTMOptimizer
VQ_VAE_HMM_fixed.py:204-212, LSTMDeltaHedger delta_hedger.py:79-92,
RegimeChangeDetector / ForwardTransitionPredictor regime_utilities.py:7-32).

Parameter layout matches torch nn.LSTM per layer: weight_ih (4H, D),
weight_hh (4H, H), bias_ih (4H,), bias_hh (4H,) with gate order
[input, forget, cell, output] — so torch checkpoints load directly.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict


def init_lstm(key, input_dim: int, hidden_dim: int,
              num_layers: int = 1) -> List[Params]:
    """torch default init: U(-1/sqrt(H), 1/sqrt(H)) for all weights."""
    bound = 1.0 / math.sqrt(hidden_dim)
    layers = []
    for layer in range(num_layers):
        d = input_dim if layer == 0 else hidden_dim
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        u = lambda k, shape: jax.random.uniform(
            k, shape, jnp.float32, -bound, bound)
        layers.append({
            "weight_ih": u(k1, (4 * hidden_dim, d)),
            "weight_hh": u(k2, (4 * hidden_dim, hidden_dim)),
            "bias_ih": u(k3, (4 * hidden_dim,)),
            "bias_hh": u(k4, (4 * hidden_dim,)),
        })
    return layers


def _cell(p: Params, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    gates = (x_t @ p["weight_ih"].T + p["bias_ih"]
             + h @ p["weight_hh"].T + p["bias_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def lstm(layers: List[Params], x: jnp.ndarray
         ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """x: (B, T, D) -> (outputs (B, T, H), (h_n, c_n) each (L, B, H))."""
    B, T, _ = x.shape
    H = layers[0]["weight_hh"].shape[1]
    hs, cs = [], []
    out = x
    for p in layers:
        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), x.dtype)

        def step(carry, x_t, p=p):
            h, c = carry
            h, c = _cell(p, x_t, h, c)
            return (h, c), h

        (h_n, c_n), ys = lax.scan(step, (h0, c0), jnp.moveaxis(out, 1, 0))
        out = jnp.moveaxis(ys, 0, 1)
        hs.append(h_n)
        cs.append(c_n)
    return out, (jnp.stack(hs), jnp.stack(cs))
