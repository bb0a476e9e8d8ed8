"""Primitive NN ops as pure functions over parameter pytrees.

Parameters are stored in the reference's PyTorch layouts (Conv1d weight
(O, I, W), Linear weight (out, in)) so checkpoints exported from the
reference's state_dicts load without transposition bookkeeping at every call
site (SURVEY.md section 7, "Checkpoint interop").  The layout transposes
needed for XLA happen inside the op; XLA folds them into the convolution /
dot lowering, so there is no runtime cost on TPU.

Initialization matches torch.nn defaults (Kaiming-uniform weights,
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias) so training dynamics are comparable
to the reference even from fresh inits.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]

_PRECISIONS = {
    "default": None,
    "float32": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def as_seq(q, K: int):
    """Normalize a regime-probability tensor to (B, T, K).

    The reference's dim-sniffing idiom (VQ_VAE_HMM_fixed.py:64-65,
    loss_functions.py:92): a 3-D input whose dim 1 equals K is treated
    as (B, K, T) and transposed.  When T == K the layouts are
    indistinguishable and the rule resolves the square case exactly as
    the reference does (transpose)."""
    import jax.numpy as jnp

    if q.ndim == 3 and q.shape[1] == K:
        return jnp.transpose(q, (0, 2, 1))
    return q


def resolve_precision(name: Optional[str]):
    if name is None:
        return None
    return _PRECISIONS[name]


# ---------------------------------------------------------------------------
# Initializers (torch.nn defaults)
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch kaiming_uniform_(a=sqrt(5)) => bound = sqrt(6 / ((1 + 5) * fan_in))
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int,
                dtype=jnp.float32) -> Params:
    """Conv1d params, weight (O, I, W) like torch (reference Encoder/Decoder
    convs: VQ_VAE_HMM_fixed.py:34-36,77-79)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel
    return {
        "weight": _kaiming_uniform(kw, (out_ch, in_ch, kernel), fan_in, dtype),
        "bias": _kaiming_uniform(kb, (out_ch,), fan_in, dtype),
    }


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    return {
        "weight": _kaiming_uniform(kw, (out_dim, in_dim), in_dim, dtype),
        "bias": _kaiming_uniform(kb, (out_dim,), in_dim, dtype),
    }


def init_embedding(key, num: int, dim: int, dtype=jnp.float32) -> Params:
    # torch nn.Embedding default: N(0, 1)
    return {"weight": jax.random.normal(key, (num, dim), dtype)}


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------


def conv1d_same(params: Params, x: jnp.ndarray, *,
                precision=None, impl: str = "conv") -> jnp.ndarray:
    """1D convolution, stride 1, SAME (zero) padding.

    x: (B, C_in, T) -> (B, C_out, T).  Semantics of
    nn.Conv1d(C_in, C_out, k, padding=k//2) (reference:
    VQ_VAE_HMM_fixed.py:34-36).

    impl="conv": lax.conv_general_dilated.
    impl="matmul": k shifted (C_out, C_in) @ (C_in, B*T) products — the
    MXU-native shape for this model's tiny channel counts (the same
    formulation the fused Pallas encoder uses), autodiff-transparent.
    """
    w = params["weight"]  # (O, I, W)
    k = w.shape[-1]
    if k % 2 == 0:
        # even widths break the SAME-length contract (lax.conv with
        # (k//2, k//2) padding returns T+1) and the two impls would
        # disagree; the reference only uses odd kernels
        raise ValueError(f"conv1d_same requires an odd kernel width, got {k}")
    pad = k // 2
    if impl == "matmul":
        B, C, T = x.shape
        xt = jnp.transpose(x, (1, 0, 2)).reshape(C, B * T)
        col = jnp.arange(B * T) % T
        acc = None
        for tap in range(k):
            dt = tap - pad  # offset of the input sample read for output t
            if dt < 0:
                shifted = jnp.roll(xt, -dt, axis=1) * (col >= -dt)
            elif dt > 0:
                shifted = jnp.roll(xt, -dt, axis=1) * (col < T - dt)
            else:
                shifted = xt
            term = jnp.matmul(w[:, :, tap], shifted, precision=precision)
            acc = term if acc is None else acc + term
        y = acc.reshape(w.shape[0], B, T).transpose(1, 0, 2)
        return y + params["bias"][None, :, None]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    return y + params["bias"][None, :, None]


def linear(params: Params, x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """x: (..., in) -> (..., out); weight stored (out, in) like torch."""
    y = jnp.matmul(x, params["weight"].T, precision=precision)
    return y + params["bias"]


def mlp2(p1: Params, p2: Params, x: jnp.ndarray, *,
         precision=None) -> jnp.ndarray:
    """Linear -> ReLU -> Linear (the reference's ubiquitous 2-layer MLP)."""
    h = jax.nn.relu(linear(p1, x, precision=precision))
    return linear(p2, h, precision=precision)
