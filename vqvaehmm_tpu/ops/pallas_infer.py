"""Fused serving forward: encoder -> precise softmax q -> soft codebook ->
decoder, one VMEM-resident kernel.

Why: the serving hot path (reference inference_api/app.py:62-65 — encode,
softmax, decode per request) is memory-bound under XLA: every fusion
boundary round-trips (B, C, T) activations through HBM.  Measured
saturated marginals at T=200 (BENCH_NOTES.md "Serving forward"): the XLA
forward costs 158 us at B=64 — more than the fused TRAIN kernel that also
computes every gradient (~91 us).  This kernel keeps the whole forward in
VMEM in the same (channels, B*T) token layout as ops/pallas_train.py
(whose forward section it mirrors), with the PRECISE softmax/exp the XLA
serving path uses (ops/precise.py lowers to FMA + integer bit ops inside
Mosaic).

Per-sequence bounds: valid_to may be a scalar or a (B,) vector — the mask
arrives as a precomputed (1, N) row, so requests of different lengths
batched together each keep their own bound (the serving micro-batcher's
bit-exactness contract, serve/batching.py).

Row independence: lane rolls for the conv taps are masked at sequence
boundaries (col % T), so each sequence's outputs depend only on its own
lanes — a batched row is bit-identical to the same row served solo with
the same block geometry (asserted in tests/test_pallas_infer.py).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .pallas_train import _pick_block_b, fits_vmem, full_spec, tok_spec
from .precise import pexp

Params = Dict

_NEG = -1e30


def _kernel(xt_ref, vm_ref,
            ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
            embT_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
            mu_ref, logvar_ref, q_ref, *, T: int, K: int, highest: bool):
    f32 = jnp.float32
    x = xt_ref[:].astype(f32)
    vm = vm_ref[:]
    N = x.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, N), 1) % T
    left_ok = (col > 0).astype(f32)
    right_ok = (col < T - 1).astype(f32)

    # Follows the model's matmul_precision like every other path:
    # "highest" = full-f32 MXU passes, matching the XLA serving forward to
    # ~1e-7 at 2.5x its speed; "default" = single bf16 passes, ~3x faster
    # still (~9e-4 deviation class, same as bf16 training).  Measured
    # on-chip in BENCH_NOTES.md "Fused serving forward".
    prec = lax.Precision.HIGHEST if highest else lax.Precision.DEFAULT

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def conv3(h, w_ref, b_ref):
        hm = jnp.roll(h, 1, axis=1) * left_ok
        hp = jnp.roll(h, -1, axis=1) * right_ok
        wcat = jnp.concatenate([w_ref[0], w_ref[1], w_ref[2]], axis=1)
        return dot(wcat, jnp.concatenate([hm, h, hp], axis=0)) + b_ref[:]

    # encoder (masking convention of VAEHMM.encode: after conv1 only)
    h1 = jnp.maximum(conv3(x, ew1_ref, eb1_ref), 0.0) * vm
    h2 = jnp.maximum(conv3(h1, ew2_ref, eb2_ref), 0.0)
    logits = dot(ew3_ref[:], h2) + eb3_ref[:]               # (K, N)

    # precise softmax over the K rows (same math as ops/precise.psoftmax)
    rows = [logits[k:k + 1] for k in range(K)]
    m = functools.reduce(jnp.maximum, rows)
    msafe = jnp.maximum(m, _NEG)
    exps = [pexp(r - msafe) for r in rows]
    z = sum(exps)
    q = jnp.concatenate([e / z for e in exps], axis=0)      # (K, N)

    # decoder (masking convention of VAEHMM.decode: e and after conv1)
    e = dot(embT_ref[:], q) * vm                            # (D, N)
    hd1 = jnp.maximum(conv3(e, dw1_ref, db1_ref), 0.0) * vm
    hd2 = jnp.maximum(conv3(hd1, dw2_ref, db2_ref), 0.0)
    out = dot(dw3_ref[:], hd2) + db3_ref[:]                 # (2C, N)
    C = x.shape[0]
    mu_ref[:] = out[:C]
    logvar_ref[:] = out[C:]
    q_ref[:] = q


@functools.partial(jax.jit, static_argnames=("K", "T", "block_b",
                                             "interpret", "highest"))
def _call(xt, vm, weights, *, K: int, T: int, block_b: int,
          interpret: bool, highest: bool):
    C, N = xt.shape
    NP = block_b * T

    return pl.pallas_call(
        functools.partial(_kernel, T=T, K=K, highest=highest),
        grid=(N // NP,),
        in_specs=[tok_spec(C, NP), tok_spec(1, NP)]
        + [full_spec(w) for w in weights],
        out_specs=(tok_spec(C, NP), tok_spec(C, NP), tok_spec(K, NP)),
        out_shape=(jax.ShapeDtypeStruct((C, N), jnp.float32),
                   jax.ShapeDtypeStruct((C, N), jnp.float32),
                   jax.ShapeDtypeStruct((K, N), jnp.float32)),
        interpret=interpret,
    )(xt, vm, *weights)


def _infer_rows_estimate(cfg) -> int:
    """Rough live-row count of the kernel's working set (taps-stacked conv
    inputs dominate; no backward state)."""
    D, H1, H2 = cfg.hidden_dim, cfg.hidden_dim, cfg.hidden_dim2
    return (8 * cfg.input_dim + 4 * max(H1, D) + 4 * H2 + 4 * D
            + 4 * cfg.K + 8)


def supported(cfg, B: int, T: int) -> bool:
    """True when the fused forward can run at these shapes."""
    if T % 8 != 0:
        return False
    bb = _pick_block_b(B, T)
    return bb != 0 and fits_vmem(_infer_rows_estimate(cfg), bb, T)


def batch_multiple(T: int) -> int:
    """Smallest batch multiple making a T-bucket kernel-eligible
    (block lanes % 128 == 0): serving pads its batch dimension up to this
    so solo and micro-batched requests share the same block geometry."""
    return 128 // math.gcd(T, 128)


def pack_infer_weights(p: Params):
    f32 = jnp.float32
    return (
        jnp.transpose(p["encoder"]["conv1"]["weight"], (2, 0, 1)).astype(f32),
        p["encoder"]["conv1"]["bias"][:, None].astype(f32),
        jnp.transpose(p["encoder"]["conv2"]["weight"], (2, 0, 1)).astype(f32),
        p["encoder"]["conv2"]["bias"][:, None].astype(f32),
        p["encoder"]["to_logits"]["weight"][:, :, 0].astype(f32),
        p["encoder"]["to_logits"]["bias"][:, None].astype(f32),
        p["decoder"]["embeddings"]["weight"].T.astype(f32),
        jnp.transpose(p["decoder"]["conv1"]["weight"], (2, 0, 1)).astype(f32),
        p["decoder"]["conv1"]["bias"][:, None].astype(f32),
        jnp.transpose(p["decoder"]["conv2"]["weight"], (2, 0, 1)).astype(f32),
        p["decoder"]["conv2"]["bias"][:, None].astype(f32),
        p["decoder"]["to_params"]["weight"][:, :, 0].astype(f32),
        p["decoder"]["to_params"]["bias"][:, None].astype(f32),
    )


@functools.partial(jax.jit, static_argnames=("model", "interpret"))
def fused_forward(model, params: Params, x: jnp.ndarray,
                  valid_to=None, interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mu, logvar, q), each (B, C|K, T) — one-kernel twin of
    encode -> psoftmax -> decode with scalar or per-sequence valid_to."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cfg = model.cfg
    B, C, T = x.shape
    K = cfg.K
    block_b = _pick_block_b(B, T) if not interpret \
        else (B if B <= 8 else math.gcd(B, 8))
    if T % 8 != 0 or block_b == 0:
        raise ValueError(f"fused forward unsupported at B={B}, T={T}")

    N = B * T
    f32 = jnp.float32
    xt = jnp.transpose(x.astype(f32), (1, 0, 2)).reshape(C, N)
    tcol = jnp.arange(T, dtype=jnp.int32)[None, :]
    if valid_to is None:
        vm = jnp.ones((1, N), f32)
    else:
        vt = jnp.asarray(valid_to)
        if vt.ndim == 0:
            vm = jnp.broadcast_to((tcol < vt).astype(f32),
                                  (B, T)).reshape(1, N)
        else:
            vm = (tcol < vt[:, None]).astype(f32).reshape(1, N)
        # zero x beyond valid_to before conv1, matching VAEHMM.encode: a
        # non-zero tail would otherwise leak into t = valid_to-1 through
        # the k=3 SAME conv (no-op for zero-padded producers)
        xt = xt * vm

    highest = model.cfg.matmul_precision == "highest"
    mu, logvar, q = _call(xt, vm, pack_infer_weights(params),
                          K=K, T=T, block_b=block_b, interpret=interpret,
                          highest=highest)
    unpack = lambda a, ch: jnp.transpose(a.reshape(ch, B, T), (1, 0, 2))
    return unpack(mu, C), unpack(logvar, C), unpack(q, K)
