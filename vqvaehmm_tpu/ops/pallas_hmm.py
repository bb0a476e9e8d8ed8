"""Fused Pallas Viterbi decode: the entire max-plus recursion + backtrace
for a batch block runs inside one VMEM-resident kernel.

Why: the lax.scan Viterbi (ops/hmm.py) issues 2T tiny device ops (forward
maxes + reverse gathers); at K=3 each op moves a few hundred bytes, so the
decode is pure dispatch overhead.  Here the whole (T, K, K, B-block)
transition block and backpointer tape live in VMEM; the time loop is a
fori_loop over in-register (K, B) tiles with the batch on the lane
dimension.  Max-plus uses only add/max/select — exact arithmetic, no
transcendental error, bit-identical paths to the scan implementation.

Layouts (host-side wrapper transposes):
  log_A   (B, T, K, K) -> (T, K, K, B)
  log_obs (B, T, K)    -> (T, K, B)
  states  out (T, B)   -> (B, T)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .hmm import ViterbiResult, _as_time_varying, _mask_inputs

_LANES = 128


def _viterbi_kernel(pi_ref, A_ref, obs_ref, states_ref, score_ref,
                    bp_ref, *, T: int, K: int):
    # init: delta[k, b] = pi[k] + obs[0, k, b]
    delta0 = pi_ref[:] + obs_ref[0]  # (K, B)

    def fwd(t, delta):
        A_t = A_ref[t]                              # (K, K, B)
        scores = delta[:, None, :] + A_t            # (K_prev, K, B)
        bp = jnp.argmax(scores, axis=0).astype(jnp.int32)  # (K, B)
        bp_ref[t] = bp
        return jnp.max(scores, axis=0) + obs_ref[t]

    delta = lax.fori_loop(1, T, fwd, delta0)

    state = jnp.argmax(delta, axis=0).astype(jnp.int32)  # (B,)
    score_ref[:] = jnp.max(delta, axis=0, keepdims=True)
    states_ref[T - 1] = state

    def back(i, state):
        t = T - 1 - i
        bp_t = bp_ref[t]  # (K, B)
        # per-lane gather bp_t[state[b], b] via K-way select (K small)
        prev = bp_t[0]
        for k in range(1, K):
            prev = jnp.where(state == k, bp_t[k], prev)
        states_ref[t - 1] = prev
        return prev

    lax.fori_loop(0, T - 1, back, state)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas(log_pi: jnp.ndarray, log_A: jnp.ndarray,
                   log_obs: jnp.ndarray,
                   lengths: Optional[jnp.ndarray] = None,
                   interpret: Optional[bool] = None) -> ViterbiResult:
    """Drop-in replacement for ops.hmm.viterbi (same results, same masking
    semantics) running as a single fused kernel per batch block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    # batch to lanes; pad B to the lane width
    pad = (-B) % _LANES
    if pad:
        # padded lanes run a harmless decode on -inf-free dummy values
        log_A = jnp.pad(log_A, ((0, pad), (0, 0), (0, 0), (0, 0)))
        log_obs = jnp.pad(log_obs, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad

    A_t = jnp.transpose(log_A, (1, 2, 3, 0))    # (T, K, K, Bp)
    obs_t = jnp.transpose(log_obs, (1, 2, 0))   # (T, K, Bp)
    pi = jnp.broadcast_to(log_pi[:, None], (K, Bp))

    grid = (Bp // _LANES,)
    states, score = pl.pallas_call(
        functools.partial(_viterbi_kernel, T=T, K=K),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, _LANES), lambda i: (0, i)),
            pl.BlockSpec((T, K, K, _LANES), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((T, K, _LANES), lambda i: (0, 0, i)),
        ],
        out_specs=(
            pl.BlockSpec((T, _LANES), lambda i: (0, i)),
            pl.BlockSpec((1, _LANES), lambda i: (0, i)),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, K, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(pi, A_t, obs_t)

    return ViterbiResult(states.T[:B], score[0, :B])
