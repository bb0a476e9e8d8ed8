"""Exact HMM inference as log-space scans — forward, backward, posterior
marginals, Viterbi decode, and ancestral sampling.

Capability upgrade over the reference: the reference never implements
forward-backward or Viterbi — its posterior is the encoder's mean-field q and
hard decode is argmax(q) (reference: backtesting.py:155,
src/backtesting.py:107, regime_utilities.py:61); the only exact inference it
touches is delegated to TensorFlow Probability (reference: hmm.py:30-42).
This module provides genuine exact inference natively:

* `lax.scan` recursions (O(T) depth, minimal memory) — the default.
* `lax.associative_scan` over (K, K) log-matmul operators (O(log T) depth,
  fully parallel over time) — for long sequences / latency-critical decode,
  and makes sequence-sharding trivial if ever needed (SURVEY.md section 5).

Conventions (matching the reference Prior, VQ_VAE_HMM_fixed.py:59-71):
  log_pi  : (K,)          initial state log-probs
  log_A   : (B, T, K, K)  row-normalized; log_A[:, t, i, j] is the
                          transition i->j used *into* step t (the ELBO
                          consumes log_A[:, 1:], so index 0 is unused), or
                          (K, K) stationary (broadcast internally).
  log_obs : (B, T, K)     per-step emission log-likelihoods log p(x_t | z=k)
  lengths : (B,) optional; padded steps become identity transitions with
            zero observation, so likelihoods, Viterbi scores, pairwise
            marginals, and all rows t < L are exact for ragged batches
            under static shapes.  Marginal rows at padded steps t >= L
            REPEAT the last valid row (each still normalizes to 1) —
            time-aggregating consumers must mask with their own validity
            mask; xi is already zeroed at invalid pairs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .precise import pexp, plogsumexp, psoftmax


def _as_time_varying(log_A: jnp.ndarray, B: int, T: int) -> jnp.ndarray:
    """Broadcast (K,K) / (T,K,K) / (B,T,K,K) to (B,T,K,K).

    A 3-D input is time-varying-shared-across-batch BY CONTRACT; a
    per-batch stationary (B,K,K) is NOT supported and is rejected here
    (when B == T it would silently transpose the meaning — sequence b
    would use batch t's matrix)."""
    if log_A.ndim == 2:
        return jnp.broadcast_to(log_A[None, None], (B, T) + log_A.shape)
    if log_A.ndim == 3:
        if log_A.shape[0] != T:
            raise ValueError(
                f"3-D log_A must be (T,K,K) with T={T}, got "
                f"{log_A.shape}; per-batch stationary (B,K,K) is not "
                "supported — tile it to (B,T,K,K) explicitly")
        return jnp.broadcast_to(log_A[None], (B,) + log_A.shape)
    if log_A.shape[:2] != (B, T):
        raise ValueError(
            f"4-D log_A must be (B,T,K,K)=({B},{T},K,K), got "
            f"{log_A.shape}")
    return log_A


def _mask_inputs(log_A: jnp.ndarray, log_obs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Make padded steps inert: identity transition, zero observation."""
    if lengths is None:
        return log_A, log_obs
    B, T, K = log_obs.shape
    valid = jnp.arange(T)[None, :] < lengths[:, None]  # (B,T)
    log_obs = jnp.where(valid[:, :, None], log_obs, 0.0)
    eye = jnp.where(jnp.eye(K, dtype=bool), 0.0, -jnp.inf)
    log_A = jnp.where(valid[:, :, None, None], log_A, eye[None, None])
    return log_A, log_obs


class ForwardResult(NamedTuple):
    log_alpha: jnp.ndarray      # (B, T, K) filtered log p(z_t, x_{1:t})
    log_likelihood: jnp.ndarray  # (B,) log p(x_{1:L})


def forward(log_pi: jnp.ndarray, log_A: jnp.ndarray, log_obs: jnp.ndarray,
            lengths: Optional[jnp.ndarray] = None) -> ForwardResult:
    """Log-space forward recursion via lax.scan over time."""
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    alpha0 = log_pi[None, :] + log_obs[:, 0]  # (B,K)

    def step(alpha, inputs):
        lA_t, lobs_t = inputs  # (B,K,K), (B,K)
        # alpha_j = logsumexp_i(alpha_i + A[i,j]) + obs_j
        alpha = plogsumexp(alpha[:, :, None] + lA_t, axis=1) + lobs_t
        return alpha, alpha

    # scan over t = 1..T-1; inputs time-major
    xs = (jnp.moveaxis(log_A[:, 1:], 1, 0), jnp.moveaxis(log_obs[:, 1:], 1, 0))
    alpha_T, alphas = lax.scan(step, alpha0, xs)
    log_alpha = jnp.concatenate(
        [alpha0[:, None], jnp.moveaxis(alphas, 0, 1)], axis=1)
    # With masked (identity/zero) padding, alpha freezes at t = L-1, so the
    # final row always carries the ragged-sequence likelihood.
    ll = plogsumexp(alpha_T, axis=-1)
    return ForwardResult(log_alpha, ll)


def backward(log_A: jnp.ndarray, log_obs: jnp.ndarray,
             lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Log-space backward recursion: beta_t(i) = log p(x_{t+1:T} | z_t=i)."""
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    betaT = jnp.zeros((B, K), log_obs.dtype)

    def step(beta, inputs):
        lA_t, lobs_t = inputs  # transition into t, obs at t
        beta = plogsumexp(
            lA_t + (lobs_t + beta)[:, None, :], axis=2)
        return beta, beta

    xs = (jnp.moveaxis(log_A[:, 1:], 1, 0)[::-1],
          jnp.moveaxis(log_obs[:, 1:], 1, 0)[::-1])
    _, betas = lax.scan(step, betaT, xs)
    log_beta = jnp.concatenate(
        [jnp.moveaxis(betas, 0, 1)[:, ::-1], betaT[:, None]], axis=1)
    return log_beta


def posterior_marginals(log_pi, log_A, log_obs,
                        lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Smoothed marginals gamma:(B,T,K) = p(z_t | x_{1:L}) (normalized)."""
    fwd = forward(log_pi, log_A, log_obs, lengths)
    log_beta = backward(log_A, log_obs, lengths)
    log_gamma = fwd.log_alpha + log_beta
    return psoftmax(log_gamma, axis=-1)


def filtered_marginals(log_pi, log_A, log_obs,
                       lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Causal (filtering) marginals (B,T,K) = p(z_t | x_{1:t}) — no
    lookahead, suitable for online/real-time regime detection where the
    smoothed posterior would peek at the future."""
    fwd = forward(log_pi, log_A, log_obs, lengths)
    return psoftmax(fwd.log_alpha, axis=-1)


def pairwise_marginals(log_pi, log_A, log_obs,
                       lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """xi:(B,T-1,K,K) = p(z_t=i, z_{t+1}=j | x) for t = 0..T-2."""
    return smoothing(log_pi, log_A, log_obs, lengths).xi


class SmoothingResult(NamedTuple):
    gamma: jnp.ndarray           # (B, T, K) smoothed marginals
    xi: jnp.ndarray              # (B, T-1, K, K) pairwise marginals
    log_likelihood: jnp.ndarray  # (B,)


def smoothing(log_pi, log_A, log_obs,
              lengths: Optional[jnp.ndarray] = None) -> SmoothingResult:
    """All smoothing statistics from ONE forward + ONE backward scan
    (posterior_marginals + pairwise_marginals + likelihood each rerun the
    scans internally; EM should use this instead — 3x fewer forward scans
    per iteration).

    With lengths, xi is ZEROED at invalid pairs (t >= L-1): the masked
    identity transition would otherwise put gamma_{L-1} on the diagonal
    of every padded step, and summing xi over time (the Baum-Welch
    M-step) would overcount self-transitions by (T-L)*gamma_{L-1}.
    gamma rows at padded steps repeat the last valid row (see module
    docstring)."""
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_Am, log_obsm = _mask_inputs(log_A, log_obs, lengths)
    # inputs are already masked: pass lengths=None so forward/backward
    # don't re-broadcast and re-mask the same (B,T,K,K) tensors
    fwd = forward(log_pi, log_Am, log_obsm, None)
    log_beta = backward(log_Am, log_obsm, None)
    gamma = psoftmax(fwd.log_alpha + log_beta, axis=-1)
    log_xi = (fwd.log_alpha[:, :-1, :, None] + log_Am[:, 1:]
              + (log_obsm + log_beta)[:, 1:, None, :])
    xi = pexp(log_xi - fwd.log_likelihood[:, None, None, None])
    if lengths is not None:
        valid = jnp.arange(T)[None, :] < lengths[:, None]  # (B,T)
        pair_valid = valid[:, 1:] & valid[:, :-1]
        xi = xi * pair_valid[:, :, None, None]
    return SmoothingResult(gamma, xi, fwd.log_likelihood)


class ViterbiResult(NamedTuple):
    states: jnp.ndarray  # (B, T) int32 MAP path (frozen past L-1 if ragged)
    score: jnp.ndarray   # (B,) log p(z*, x)


def viterbi(log_pi, log_A, log_obs,
            lengths: Optional[jnp.ndarray] = None) -> ViterbiResult:
    """Max-product decode with backtrace (max-plus scan + reverse scan)."""
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    delta0 = log_pi[None, :] + log_obs[:, 0]

    def fstep(delta, inputs):
        lA_t, lobs_t = inputs
        scores = delta[:, :, None] + lA_t  # (B,K_prev,K)
        best = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (B,K)
        delta = jnp.max(scores, axis=1) + lobs_t
        return delta, (delta, best)

    xs = (jnp.moveaxis(log_A[:, 1:], 1, 0), jnp.moveaxis(log_obs[:, 1:], 1, 0))
    delta_T, (_, backptrs) = lax.scan(fstep, delta0, xs)  # backptrs (T-1,B,K)

    last = jnp.argmax(delta_T, axis=-1).astype(jnp.int32)  # (B,)
    score = jnp.max(delta_T, axis=-1)

    def bstep(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, path_rev = lax.scan(bstep, last, backptrs[::-1])
    states = jnp.concatenate(
        [path_rev[::-1].T, last[:, None]], axis=1)  # (B,T)
    return ViterbiResult(states, score)


# ---------------------------------------------------------------------------
# Associative-scan (parallel-in-time) variants
# ---------------------------------------------------------------------------


def _log_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., K, K) log-space matrix product: logsumexp_k a[i,k] + b[k,j]."""
    return plogsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def forward_assoc(log_pi, log_A, log_obs,
                  lengths: Optional[jnp.ndarray] = None) -> ForwardResult:
    """Forward pass via lax.associative_scan: O(log T) depth, parallel in T.

    Element t is the (K,K) operator M_t[i,j] = log_A_t[i,j] + log_obs_t[j];
    the inclusive prefix products applied to the initial row give alpha_t.
    """
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    ops = log_A[:, 1:] + log_obs[:, 1:, None, :]  # (B, T-1, K, K)
    prefix = lax.associative_scan(_log_matmul, ops, axis=1)
    alpha0 = log_pi[None, :] + log_obs[:, 0]  # (B, K)
    # alpha_t = alpha0 (row-vector) log-matmul prefix_t
    rest = plogsumexp(
        alpha0[:, None, :, None] + prefix, axis=2)  # (B, T-1, K)
    log_alpha = jnp.concatenate([alpha0[:, None], rest], axis=1)
    ll = plogsumexp(log_alpha[:, -1], axis=-1)
    return ForwardResult(log_alpha, ll)


def viterbi_assoc_scores(log_pi, log_A, log_obs,
                         lengths: Optional[jnp.ndarray] = None):
    """Max-plus associative scan giving Viterbi deltas (no backtrace);
    useful for parallel scoring / O(log T) MAP probability."""
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    def maxplus(a, b):
        return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    ops = log_A[:, 1:] + log_obs[:, 1:, None, :]
    prefix = lax.associative_scan(maxplus, ops, axis=1)
    delta0 = log_pi[None, :] + log_obs[:, 0]
    rest = jnp.max(delta0[:, None, :, None] + prefix, axis=2)
    deltas = jnp.concatenate([delta0[:, None], rest], axis=1)
    return deltas, jnp.max(deltas[:, -1], axis=-1)


def sample(key: jax.Array, log_pi, log_A, num_steps: int,
           batch: int = 1) -> jnp.ndarray:
    """Ancestral sampling of state paths: (batch, num_steps) int32.

    Covers hmm.sample from the reference design sketch (pseudocode.txt:30).
    """
    log_A = _as_time_varying(log_A, batch, num_steps)
    k0, kr = jax.random.split(key)
    z0 = jax.random.categorical(k0, jnp.broadcast_to(log_pi, (batch, log_pi.shape[-1])))

    def step(carry, inputs):
        z, key = carry
        lA_t, = inputs
        key, sub = jax.random.split(key)
        rows = jnp.take_along_axis(
            lA_t, z[:, None, None], axis=1)[:, 0]  # (B,K)
        z = jax.random.categorical(sub, rows)
        return (z, key), z

    xs = (jnp.moveaxis(log_A[:, 1:], 1, 0),)
    (_, _), zs = lax.scan(step, (z0, kr), xs)
    return jnp.concatenate([z0[:, None], zs.T], axis=1).astype(jnp.int32)
