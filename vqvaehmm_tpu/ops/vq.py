"""Vector quantization: fused nearest-neighbour codebook lookup.

The capability upgrade the repo name promises: the reference sketches true
VQ (nearest-neighbour quantize + straight-through estimator + commitment /
codebook losses) in pseudocode.txt:10-19 but never implements it in any .py
file (SURVEY.md section 2.1).  Here it is implemented TPU-first:

* Distances never materialize: scores = z @ E^T (MXU) folded with the
  codebook norms; argmin over K.
* The gather of selected codes is a one-hot matmul (MXU) — no
  scatter/gather, which TPUs hate.
* A Pallas kernel (`vq_pallas`) fuses score computation, argmin, and the
  one-hot re-expansion in VMEM for the hot path; the pure-XLA path
  (`vq_lookup`) is the portable reference and the autodiff surface.
* Straight-through estimator + EMA codebook updates included.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class VQResult(NamedTuple):
    quantized: jnp.ndarray      # z_q, same shape as z_e (straight-through)
    indices: jnp.ndarray        # (...,) int32 code ids
    commitment_loss: jnp.ndarray  # beta * ||z_e - sg(e)||^2 (mean)
    codebook_loss: jnp.ndarray    # ||sg(z_e) - e||^2 (mean)


def nearest_codes(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """z: (N, D), codebook: (K, D) -> (N,) argmin_k ||z - e_k||^2.

    Uses the expansion ||z-e||^2 = ||z||^2 - 2 z.e + ||e||^2; the ||z||^2
    term is constant in k and dropped, so the score matrix is one matmul.
    """
    scores = z @ codebook.T - 0.5 * jnp.sum(codebook * codebook, axis=-1)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def vq_lookup(z: jnp.ndarray, codebook: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA quantize: returns (z_q, indices) for z: (..., D)."""
    flat = z.reshape(-1, z.shape[-1])
    idx = nearest_codes(flat, codebook)
    onehot = jax.nn.one_hot(idx, codebook.shape[0], dtype=z.dtype)
    zq = onehot @ codebook
    return zq.reshape(z.shape), idx.reshape(z.shape[:-1])


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _vq_kernel(z_ref, cb_ref, zq_ref, idx_ref):
    z = z_ref[:]                       # (TN, D)
    cb = cb_ref[:]                     # (K, D)
    scores = jnp.dot(z, cb.T, preferred_element_type=jnp.float32)
    scores = scores - 0.5 * jnp.sum(cb * cb, axis=-1)[None, :]
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    K = cb.shape[0]
    onehot = (idx[:, None] ==
              lax.broadcasted_iota(jnp.int32, (1, K), 1)).astype(z.dtype)
    zq_ref[:] = jnp.dot(onehot, cb, preferred_element_type=jnp.float32
                        ).astype(z.dtype)
    idx_ref[:] = idx[:, None]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def vq_pallas(z: jnp.ndarray, codebook: jnp.ndarray,
              block_rows: int = 1024, interpret: bool | None = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused VMEM quantize for z: (N, D); returns (z_q:(N,D), idx:(N,)).

    Grid over row blocks; the codebook is resident in VMEM for every block.
    Falls back to interpreter mode off-TPU so tests run anywhere.
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D = z.shape
    K = codebook.shape[0]
    # pad rows to a multiple of the block
    pad = (-N) % block_rows
    zp = jnp.pad(z, ((0, pad), (0, 0))) if pad else z
    grid = (zp.shape[0] // block_rows,)

    zq, idx = pl.pallas_call(
        _vq_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(zp.shape, z.dtype),
            jax.ShapeDtypeStruct((zp.shape[0], 1), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
            pl.BlockSpec((K, D), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(zp, codebook)
    return zq[:N], idx[:N, 0]


# ---------------------------------------------------------------------------
# Straight-through quantizer + losses + EMA updates
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _pallas_nearest_codes(z: jnp.ndarray, codebook: jnp.ndarray):
    """Index selection via the Pallas kernel, opaque to autodiff (the
    pallas_call has no differentiation rule; indices are integral anyway,
    so the correct cotangents are zero)."""
    return vq_pallas(z, codebook)[1]


def _pnc_fwd(z, codebook):
    return _pallas_nearest_codes(z, codebook), (z, codebook)


def _pnc_bwd(res, g):
    z, codebook = res
    return jnp.zeros_like(z), jnp.zeros_like(codebook)


_pallas_nearest_codes.defvjp(_pnc_fwd, _pnc_bwd)


def quantize_st(z_e: jnp.ndarray, codebook: jnp.ndarray,
                commitment_beta: float = 0.25,
                use_pallas: bool = False,
                mask: jnp.ndarray = None) -> VQResult:
    """Quantize with the straight-through estimator
    (pseudocode.txt:12-19: z_q_st = z_e + sg(z_q - z_e), commit/codebook
    losses).

    mask: optional (..., T) validity over z_e's leading dims — with it
    the commitment/codebook losses are means over VALID positions only,
    so padded timesteps cannot pull codebook vectors toward padding
    latents (they'd otherwise enter the unmasked means)."""
    if use_pallas:
        # the kernel only picks the indices; z_q is re-expanded
        # differentiably (one_hot @ codebook) so the codebook loss can
        # backprop
        flat = z_e.reshape(-1, z_e.shape[-1])
        idx_flat = _pallas_nearest_codes(flat, codebook)
        onehot = jax.nn.one_hot(idx_flat, codebook.shape[0], dtype=z_e.dtype)
        z_q = (onehot @ codebook).reshape(z_e.shape)
        idx = idx_flat.reshape(z_e.shape[:-1])
    else:
        z_q, idx = vq_lookup(z_e, codebook)
    if mask is not None:
        m = mask.astype(z_e.dtype)[..., None]          # (..., T, 1)
        denom = jnp.maximum(m.sum() * z_e.shape[-1], 1.0)
        commitment = commitment_beta * (
            ((z_e - lax.stop_gradient(z_q)) ** 2) * m).sum() / denom
        codebook_loss = (
            ((lax.stop_gradient(z_e) - z_q) ** 2) * m).sum() / denom
    else:
        commitment = commitment_beta * jnp.mean(
            (z_e - lax.stop_gradient(z_q)) ** 2)
        codebook_loss = jnp.mean((lax.stop_gradient(z_e) - z_q) ** 2)
    z_q_st = z_e + lax.stop_gradient(z_q - z_e)
    return VQResult(z_q_st, idx, commitment, codebook_loss)


class EMAState(NamedTuple):
    cluster_size: jnp.ndarray  # (K,)
    cluster_sum: jnp.ndarray   # (K, D)


def ema_init(codebook: jnp.ndarray) -> EMAState:
    return EMAState(jnp.ones(codebook.shape[0], codebook.dtype),
                    codebook.copy())


def ema_update(state: EMAState, codebook: jnp.ndarray, z_e: jnp.ndarray,
               idx: jnp.ndarray, decay: float = 0.99,
               eps: float = 1e-5) -> Tuple[EMAState, jnp.ndarray]:
    """EMA codebook update (VQ-VAE appendix variant): exponential moving
    averages of per-code counts and sums; returns new (state, codebook)."""
    K = codebook.shape[0]
    flat = z_e.reshape(-1, z_e.shape[-1])
    onehot = jax.nn.one_hot(idx.reshape(-1), K, dtype=flat.dtype)  # (N, K)
    counts = onehot.sum(0)
    sums = onehot.T @ flat
    size = decay * state.cluster_size + (1 - decay) * counts
    total = decay * state.cluster_sum + (1 - decay) * sums
    n = size.sum()
    stable = (size + eps) / (n + K * eps) * n
    new_codebook = total / stable[:, None]
    return EMAState(size, total), new_codebook
