"""Fused Pallas Viterbi decode: the entire max-plus recursion + backtrace
for a batch block runs inside one VMEM-resident kernel.

Why: the lax.scan Viterbi (ops/hmm.py) issues 2T tiny device ops (forward
maxes + reverse gathers); at K=3 each op moves a few hundred bytes, so the
decode is pure dispatch overhead.

The kernel replaces the sequential time loop with TWO in-kernel doubling
(Hillis-Steele) scans — ceil(log2 T) fully vectorized levels each, every
level operating on (T, lanes) tiles:
  1. max-plus prefix scan of the (K, K) step matrices E_t = A_t + obs_t
     gives delta_t for ALL t at once (delta_t = delta_0 (x) E_1 ... E_t);
     backpointers then come from one vectorized argmax over prev-states.
  2. the backtrace s_t = bp_{t+1}[s_{t+1}] is a composition of selector
     maps [K] -> [K], which is associative — a suffix doubling scan of
     K-way selects collapses it.
So a T=200 decode is ~16 vector levels instead of ~400 sequential steps.
K is small and static: all (K, K) structure is unrolled into 2D (T, lane)
arrays, which tile perfectly.

Note on ties: max-plus addition is reassociated by the scan, so scores can
differ from the sequential recursion by float-rounding ULPs; where two
paths tie within that margin the decoded path may differ while remaining
an (equal-score) MAP path — the same property as the XLA associative-scan
formulation (ops/hmm.viterbi_assoc_scores).

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


_NEG = -1e30  # max-plus "-inf" that stays finite under addition


def viterbi_supported(T: int, K: int,
                      budget_bytes: int = 14 * 1024 * 1024) -> bool:
    """True when the doubling-scan kernel's working set fits scoped VMEM.

    The kernel keeps O(K) live (T, 128) tapes: K*K step-matrix slices of
    the transition tape plus delta/bp (2K) in phase 1 and G/Gs/out (3K)
    selector tapes in phase 3, all f32/i32.  Measured calibration: a
    T=2327, K=3 decode was rejected by Mosaic at 24.84 MB — consistent
    with ~(K*K + 5K + 4) tapes — so the gate uses that coefficient
    against the 14 MB budget shared with the other kernels.  Beyond it,
    callers (VAEHMM.viterbi_decode auto-dispatch) must take the lax.scan
    path; forcing use_pallas=True past the bound fails at compile."""
    tapes = K * K + 5 * K + 4
    return tapes * T * _LANES * 4 <= budget_bytes


def _viterbi_kernel(pi_ref, A_ref, obs_ref, states_ref, score_ref,
                    *, T: int, K: int):
    f32 = jnp.float32
    L = obs_ref.shape[-1]

    def A(p, k):   # (T, L) slice of the transition tape
        return A_ref[:, p, k, :]

    def obs(k):    # (T, L)
        return obs_ref[:, k, :]

    # -- phase 1: max-plus prefix scan of step matrices ------------------
    # M[p][k] over t; row t=0 is the max-plus identity, rows t>=1 are
    # E_t[p,k] = A_t[p,k] + obs_t[k].
    ident = [[jnp.full((1, L), 0.0 if p == k else _NEG, f32)
              for k in range(K)] for p in range(K)]
    M = [[jnp.concatenate([ident[p][k], (A(p, k) + obs(k))[1:]], axis=0)
          for k in range(K)] for p in range(K)]

    s = 1
    while s < T:
        # Xs[t] = M[t-s] (identity for t < s); newM = Xs (x) M
        Xs = [[jnp.concatenate(
            [jnp.broadcast_to(ident[p][k], (s, L)), M[p][k][:T - s]],
            axis=0) for k in range(K)] for p in range(K)]
        M = [[functools.reduce(
            jnp.maximum, [Xs[p][m] + M[m][k] for m in range(K)])
            for k in range(K)] for p in range(K)]
        s *= 2

    # delta_t[k] for all t: delta_0 (x) M_t, with delta_0[p] = pi + obs_0
    d0 = [pi_ref[p:p + 1, :] + obs_ref[0:1, p, :] for p in range(K)]
    delta = [functools.reduce(
        jnp.maximum, [d0[p] + M[p][k] for p in range(K)])
        for k in range(K)]                                # K x (T, L)

    # -- phase 2: vectorized backpointers --------------------------------
    # bp_t[k] = argmax_p delta_{t-1}[p] + A_t[p,k]  (rows t>=1 valid)
    dprev = [jnp.concatenate([jnp.zeros((1, L), f32), delta[p][:T - 1]],
                             axis=0) for p in range(K)]
    bp = []
    for k in range(K):
        best = dprev[0] + A(0, k)
        arg = jnp.zeros((T, L), jnp.int32)
        for p in range(1, K):
            sc = dprev[p] + A(p, k)
            take = sc > best                 # strict: first-max tie rule
            best = jnp.where(take, sc, best)
            arg = jnp.where(take, p, arg)
        bp.append(arg)                                    # (T, L)

    # final state/score: argmax_k delta_{T-1}[k]
    best = delta[0][T - 1:T]
    s_last = jnp.zeros((1, L), jnp.int32)
    for k in range(1, K):
        sc = delta[k][T - 1:T]
        take = sc > best
        best = jnp.where(take, sc, best)
        s_last = jnp.where(take, k, s_last)
    score_ref[:] = best

    # -- phase 3: backtrace as a suffix scan of selector maps ------------
    # sigma_t = bp_{t+1} for t in [0, T-2]; G_t = sigma_t o ... o sigma_{T-2}
    if T > 1:
        G = [bp[k][1:] for k in range(K)]                 # (T-1, L) each
        Tm = T - 1

        def compose(F, Gs):
            # (F o Gs)[k] = F[Gs[k]] via K-way select
            out = []
            for k in range(K):
                r = F[0]
                for p in range(1, K):
                    r = jnp.where(Gs[k] == p, F[p], r)
                out.append(r)
            return out

        s = 1
        while s < Tm:
            # Gs[t] = G[t+s] (identity map for t+s > Tm-1)
            idk = [jnp.full((s, L), k, jnp.int32) for k in range(K)]
            Gs = [jnp.concatenate([G[k][s:], idk[k]], axis=0)
                  for k in range(K)]
            G = compose(G, Gs)
            s *= 2

        # states[t] = G_t[s_last] for t < T-1
        pre = G[0]
        for k in range(1, K):
            pre = jnp.where(jnp.broadcast_to(s_last, (Tm, L)) == k,
                            G[k], pre)
        states_ref[:T - 1] = pre
    states_ref[T - 1:T] = s_last


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
        interpret=interpret,
    )(pi, A_t, obs_t)

    return ViterbiResult(states.T[:B], score[0, :B])
