"""Fused Pallas encoder: the full conv1(k3)+ReLU -> conv2(k3)+ReLU -> 1x1
regime-logits stack in one VMEM-resident kernel.

Why: the XLA path materializes h1 (B*T*hidden) and h2 in HBM between conv
calls; at the benchmark shapes that is ~6 MB of round-trip traffic per
forward.  This kernel keeps the whole stack in VMEM — one HBM read of x,
one HBM write of logits — which is the bandwidth-optimal shape for the
encoder's tiny channel counts (SURVEY.md: win throughput by fusing across
B and T, not inside the tiny GEMMs).

Formulation: with activations laid out (C, B*T), a k=3 SAME conv is three
shifted (C_out, C_in) @ (C_in, B*T) MXU matmuls; batch-boundary columns are
masked to zero, which IS zero padding.  Gradients are not defined through
this kernel — it serves the inference path (posterior extraction for
serving/backtesting); training uses the XLA path.

Used via VAEHMM.encode(..., fused=True) / posterior(..., fused=True).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict


def _encoder_kernel(xt_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    tmask_ref, out_ref, *, T: int, highest: bool):
    """xt: (C_in, N=B*T); weights in (dt, C_out, C_in) stacks; tmask (1, N)
    zeroing invalid time positions between the two k=3 convs.

    highest follows the model's matmul_precision (full-f32 MXU passes vs
    single bf16 passes), so the kernel matches the XLA path run at the
    same precision instead of silently shifting numerics by ~1e-3 when
    auto-dispatched."""
    xt = xt_ref[:]
    N = xt.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, N), 1) % T
    left_ok = (col > 0).astype(xt.dtype)        # can read t-1
    right_ok = (col < T - 1).astype(xt.dtype)   # can read t+1
    prec = lax.Precision.HIGHEST if highest else lax.Precision.DEFAULT

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    def conv3(h, w_ref, b_ref):
        # dt = -1: y[t] += W[-1] x[t-1]  => shift right
        h_m1 = jnp.roll(h, 1, axis=1) * left_ok
        h_p1 = jnp.roll(h, -1, axis=1) * right_ok
        acc = dot(w_ref[0], h_m1)
        acc += dot(w_ref[1], h)
        acc += dot(w_ref[2], h_p1)
        return acc + b_ref[:]

    h1 = jnp.maximum(conv3(xt, w1_ref, b1_ref), 0.0)
    h1 = h1 * tmask_ref[:]  # batch-max padding semantics (valid_to)
    h2 = jnp.maximum(conv3(h1, w2_ref, b2_ref), 0.0)
    out_ref[:] = dot(w3_ref[0], h2) + b3_ref[:]


def encode_supported(cfg, B: int, T: int) -> bool:
    """True when the gridded fused encoder can run at these shapes (lane
    tiling satisfiable and block working set within the VMEM budget)."""
    from .pallas_train import _pick_block_b, fits_vmem

    if T % 8 != 0:
        return False
    bb = _pick_block_b(B, T)
    rows = 4 * cfg.input_dim + 4 * cfg.hidden_dim + 2 * cfg.hidden_dim2 \
        + cfg.K + 8
    return bb != 0 and fits_vmem(rows, bb, T)


@functools.partial(jax.jit, static_argnames=("interpret", "highest"))
def fused_encode(params: Params, x: jnp.ndarray,
                 valid_to: Optional[jnp.ndarray] = None,
                 interpret: Optional[bool] = None,
                 highest: bool = True) -> jnp.ndarray:
    """x: (B, C, T) -> regime logits (B, K, T); numerically equivalent to
    the XLA encode path run at the same matmul precision (same masking
    semantics given valid_to).

    Gridded over batch blocks (block lanes % 128 == 0) so VMEM stays
    bounded at any B; shapes with no qualifying block fall back to one
    whole-array block (small inputs only)."""
    import math

    from jax.experimental import pallas as pl

    from .pallas_train import _pick_block_b

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = params["encoder"]
    B, C, T = x.shape
    if valid_to is not None:
        # zero x at t >= valid_to BEFORE the conv stack, matching the XLA
        # path: conv1's output at t = valid_to-1 reads x[valid_to], so a
        # non-zero tail (x sliced from a longer panel) would otherwise
        # leak into the valid region (no-op for zero-padded producers)
        vt0 = jnp.asarray(valid_to)
        col0 = jnp.arange(T, dtype=jnp.int32)
        if vt0.ndim == 0:
            x = x * (col0 < vt0).astype(x.dtype)[None, None, :]
        else:  # per-sequence (B,) bounds
            x = x * (col0[None, :] < vt0[:, None]).astype(
                x.dtype)[:, None, :]
    H1 = p["conv1"]["weight"].shape[0]
    H2 = p["conv2"]["weight"].shape[0]
    K = p["to_logits"]["weight"].shape[0]
    N = B * T
    block_b = _pick_block_b(B, T) if not interpret \
        else (B if B <= 8 else math.gcd(B, 8))
    if block_b == 0:
        block_b = B  # single whole-array block (legacy small-shape path)

    # (B, C, T) -> (C, B*T)
    xt = jnp.transpose(x, (1, 0, 2)).reshape(C, N)
    # torch (O, I, W) -> per-tap stacks (W, O, I)
    w1 = jnp.transpose(p["conv1"]["weight"], (2, 0, 1))
    w2 = jnp.transpose(p["conv2"]["weight"], (2, 0, 1))
    w3 = p["to_logits"]["weight"][:, :, 0][None]  # (1, K, H2)
    b1 = p["conv1"]["bias"][:, None]
    b2 = p["conv2"]["bias"][:, None]
    b3 = p["to_logits"]["bias"][:, None]

    if valid_to is None:
        tmask = jnp.ones((1, N), x.dtype)
    else:
        col = jnp.arange(T, dtype=jnp.int32)[None, :]
        vt = jnp.asarray(valid_to)
        if vt.ndim == 0:
            tmask = jnp.broadcast_to((col < vt).astype(x.dtype),
                                     (B, T)).reshape(1, N)
        else:  # per-sequence (B,) bounds, same semantics as the XLA path
            tmask = (col < vt[:, None]).astype(x.dtype).reshape(1, N)

    NP = block_b * T
    from .pallas_train import full_spec, tok_spec

    out = pl.pallas_call(
        functools.partial(_encoder_kernel, T=T, highest=highest),
        grid=(N // NP,),
        in_specs=[tok_spec(C, NP)] + [full_spec(w) for w in
                  (w1, b1, w2, b2, w3, b3)] + [tok_spec(1, NP)],
        out_specs=tok_spec(K, NP),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        interpret=interpret,
    )(xt, w1, b1, w2, b2, w3, b3, tmask)
    return jnp.transpose(out.reshape(K, B, T), (1, 0, 2))
