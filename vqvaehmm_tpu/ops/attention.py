"""Multi-head self-attention + transformer encoder layer (torch-semantics).

Used by AttentionPortfolioOptimizer (reference: portfolio_optimizer.py:7-20)
and TransformerPortfolioOptimizer (reference: portfolio_optimizer.py:23-35).
Parameter layout matches torch so state dicts map 1:1:
  nn.MultiheadAttention: in_proj_weight (3E, E), in_proj_bias (3E,),
                         out_proj {weight (E,E), bias (E,)}
  nn.TransformerEncoderLayer (post-norm): self_attn, linear1 (ff, E),
                         linear2 (E, ff), norm1/norm2 {weight, bias}
Dropout is inference-mode identity (heads here are trained with small
models where the reference's eval path is what matters downstream).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from .nn import init_linear
from .precise import psoftmax

Params = Dict


def init_mha(key, embed_dim: int, num_heads: int) -> Params:
    if embed_dim % num_heads != 0:
        raise ValueError(
            f"embed_dim {embed_dim} not divisible by num_heads {num_heads} "
            "(note: the reference's AttentionPortfolioOptimizer default of "
            "4 heads is unusable at K=3; pick heads dividing K)")
    k1, k2 = jax.random.split(key)
    # torch _reset_parameters: xavier_uniform_ in_proj weight, ZERO
    # in_proj_bias and out_proj.bias
    limit = math.sqrt(6.0 / (embed_dim + embed_dim))
    out_proj = init_linear(k2, embed_dim, embed_dim)
    out_proj["bias"] = jnp.zeros_like(out_proj["bias"])
    return {
        "in_proj_weight": jax.random.uniform(
            k1, (3 * embed_dim, embed_dim), jnp.float32, -limit, limit),
        "in_proj_bias": jnp.zeros((3 * embed_dim,)),
        "out_proj": out_proj,
    }


def mha(params: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Self-attention over x: (B, T, E) -> (B, T, E).

    num_heads is static configuration (kept out of the param pytree so
    grads/optimizers see only array leaves).
    """
    E = x.shape[-1]
    H = num_heads
    qkv = x @ params["in_proj_weight"].T + params["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d = E // H

    def split_heads(a):  # (B,T,E) -> (B,H,T,d)
        B, T, _ = a.shape
        return jnp.moveaxis(a.reshape(B, T, H, d), 2, 1)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(d)
    attn = psoftmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    B, _, T, _ = out.shape
    out = jnp.moveaxis(out, 1, 2).reshape(B, T, E)
    return out @ params["out_proj"]["weight"].T + params["out_proj"]["bias"]


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def init_encoder_layer(key, d_model: int, num_heads: int,
                       dim_ff: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(k1, d_model, num_heads),
        "linear1": init_linear(k2, d_model, dim_ff),
        "linear2": init_linear(k3, dim_ff, d_model),
        "norm1": {"weight": jnp.ones(d_model), "bias": jnp.zeros(d_model)},
        "norm2": {"weight": jnp.ones(d_model), "bias": jnp.zeros(d_model)},
    }


def encoder_layer(p: Params, x: jnp.ndarray,
                  num_heads: int) -> jnp.ndarray:
    """Post-norm transformer encoder layer (torch default)."""
    x = layer_norm(p["norm1"], x + mha(p["self_attn"], x, num_heads))
    h = jax.nn.relu(x @ p["linear1"]["weight"].T + p["linear1"]["bias"])
    ff = h @ p["linear2"]["weight"].T + p["linear2"]["bias"]
    return layer_norm(p["norm2"], x + ff)


def init_transformer_encoder(key, d_model: int, num_heads: int,
                             dim_ff: int, num_layers: int) -> List[Params]:
    keys = jax.random.split(key, num_layers)
    return [init_encoder_layer(k, d_model, num_heads, dim_ff) for k in keys]


def transformer_encoder(layers: List[Params], x: jnp.ndarray,
                        num_heads: int) -> jnp.ndarray:
    for p in layers:
        x = encoder_layer(p, x, num_heads)
    return x
