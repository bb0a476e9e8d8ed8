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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .hmm import ViterbiResult, _as_time_varying, _mask_inputs

_LANES = 128


_NEG = -1e30  # max-plus "-inf" that stays finite under addition


def viterbi_supported(T: int, K: int,
                      budget_bytes: int = 14 * 1024 * 1024) -> bool:
    """True when the doubling-scan kernel's working set fits scoped VMEM.

    The kernel keeps O(K) live (T, 128) tapes: K*K step-matrix slices of
    the transition tape plus delta/bp (2K) in phase 1 and G/Gs/out (3K)
    selector tapes in phase 3, all f32/i32.  Calibration: a T=2327, K=3
    decode was rejected by Mosaic at 24.84 MB, which corresponds to
    ~21 live tapes; the gate's (K*K + 5K + 4) coefficient (28 tapes at
    K=3) is deliberately ~30% CONSERVATIVE of that measurement, trading
    some monolithic-kernel range (T in ~(1024, 1400] at K=3 routes to
    the tiled kernel despite likely fitting) for a margin against
    layout/version drift.  Beyond the bound, callers take the tiled
    kernel or the lax.scan path; forcing the monolithic kernel past it
    fails at compile."""
    tapes = K * K + 5 * K + 4
    return tapes * T * _LANES * 4 <= budget_bytes


# The tiled kernels run with an explicit raised scoped-VMEM limit: the
# defaults (16 MB) reject even modest chunks, and a sequential-grid
# decode kernel can afford a large working set (v5e VMEM is 128 MB).
_TILED_VMEM_LIMIT = 64 * 1024 * 1024


def _pick_chunk(K: int, budget_bytes: int = 48 * 1024 * 1024) -> int:
    """Largest power-of-two time chunk whose tiled working set fits the
    raised VMEM limit.

    Coefficient calibrated on-chip from Mosaic's scoped-allocation
    rejections (v5e): K=3/Tc=512 measured 17.89 MB (~68 tapes of
    (Tc, 128) f32) and K=8/Tc=128 measured 31.91 MB (~487 tapes) — the
    doubling scan's E/M/Xs step-matrix tapes plus the A input block all
    scale as K*K, so the fit 7*K*K + 7*K bounds both measurements with
    margin.  The 48 MB budget leaves 16 MB of the raised limit for
    pipeline buffers.  Returns 0 when even a 128-row chunk does not
    fit — with this coefficient that is K >= 10 (tapes*128*512B >
    budget) — and callers then fall back to the lax.scan path."""
    tapes = 7 * K * K + 7 * K
    cap = budget_bytes // (tapes * _LANES * 4)
    if cap < 128:
        return 0
    c = 128
    while c * 2 <= min(cap, 1024):
        c *= 2
    return c


def viterbi_tiled_supported(K: int) -> bool:
    """True when the chunked kernel can run at this K (any T)."""
    return _pick_chunk(K) > 0


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


# ---------------------------------------------------------------------------
# Tiled (chunked) Viterbi for unbounded T
#
# The monolithic kernel above keeps every (T, 128) tape in VMEM, capping T
# (~980 at K=3, `viterbi_supported`) — whole-panel decodes (T~2000+) used
# to fall back to the lax.scan path.  The tiled variant streams time in
# fixed Tc-row chunks instead, so VMEM is O(Tc) regardless of T:
#
#   forward:  grid (lane_blocks, n_chunks), chunk axis innermost (TPU
#     grids run sequentially, minor axis fastest).  Each step runs the
#     SAME doubling scan as the monolithic kernel on its chunk, seeded by
#     the carried entry delta; the carry lives in the `dlast` output
#     block, whose index map ignores the chunk axis, so Pallas keeps it
#     VMEM-resident across the chunk sweep (the accumulation idiom of
#     ops/pallas_train.py).  Backpointers stream to an HBM tape, (Tc, K,
#     128) per step.
#   backtrace: a second pallas_call sweeps the chunks in REVERSE (index
#     maps use n_chunks-1-c), carrying the boundary state; within a chunk
#     the selector-composition suffix scan of the monolithic phase 3
#     collapses the Tc sequential backtrace steps to log2(Tc) levels.
#
# T is padded to a chunk multiple with inert steps (identity transition,
# zero observation — the `_mask_inputs` convention), which freeze delta
# and make padded backpointers the identity selector, so the backtrace
# walks through padding unchanged.
# ---------------------------------------------------------------------------


def _viterbi_fwd_tiled_kernel(pi_ref, A_ref, obs_ref, bp_ref, dlast_ref,
                              *, Tc: int, K: int):
    f32 = jnp.float32
    L = obs_ref.shape[-1]
    first = pl.program_id(1) == 0

    def A(p, k):   # (Tc, L) slice of this chunk's transition tape
        return A_ref[:, p, k, :]

    def obs(k):    # (Tc, L)
        return obs_ref[:, k, :]

    # entry delta: chunk 0 starts the recursion (delta_0 = pi + obs_0,
    # with the chunk's row 0 made the scan identity); later chunks resume
    # from the carried delta of the previous chunk's last row (dlast is
    # uninitialized VMEM on the first visit — jnp.where discards it)
    d0 = [jnp.where(first, pi_ref[p:p + 1, :] + obs_ref[0:1, p, :],
                    dlast_ref[p:p + 1, :]) for p in range(K)]

    ident = [[jnp.full((1, L), 0.0 if p == k else _NEG, f32)
              for k in range(K)] for p in range(K)]
    E = [[A(p, k) + obs(k) for k in range(K)] for p in range(K)]
    M = [[jnp.concatenate(
        [jnp.where(first, ident[p][k], E[p][k][0:1]), E[p][k][1:]],
        axis=0) for k in range(K)] for p in range(K)]

    s = 1
    while s < Tc:
        Xs = [[jnp.concatenate(
            [jnp.broadcast_to(ident[p][k], (s, L)), M[p][k][:Tc - s]],
            axis=0) for k in range(K)] for p in range(K)]
        M = [[functools.reduce(
            jnp.maximum, [Xs[p][m] + M[m][k] for m in range(K)])
            for k in range(K)] for p in range(K)]
        s *= 2

    delta = [functools.reduce(
        jnp.maximum, [d0[p] + M[p][k] for p in range(K)])
        for k in range(K)]                                # K x (Tc, L)

    # backpointers: bp_t[k] = argmax_p dprev_t[p] + A_t[p,k], where the
    # chunk's row 0 prev is the carried entry delta (garbage-but-unused
    # for the global row 0)
    dprev = [jnp.concatenate([d0[p], delta[p][:Tc - 1]], axis=0)
             for p in range(K)]
    for k in range(K):
        best = dprev[0] + A(0, k)
        arg = jnp.zeros((Tc, L), jnp.int32)
        for p in range(1, K):
            sc = dprev[p] + A(p, k)
            take = sc > best                 # strict: first-max tie rule
            best = jnp.where(take, sc, best)
            arg = jnp.where(take, p, arg)
        bp_ref[:, k, :] = arg

    for p in range(K):
        dlast_ref[p:p + 1, :] = delta[p][Tc - 1:Tc]


def _viterbi_bwd_tiled_kernel(bp_ref, slast_ref, states_ref, carry_ref,
                              *, Tc: int, K: int):
    L = bp_ref.shape[-1]
    first = pl.program_id(1) == 0   # reversed sweep: 0 = LAST chunk

    # state at this chunk's last row: global argmax for the last chunk,
    # else the carried boundary state from the chunk to the right
    s_end = jnp.where(first, slast_ref[:], carry_ref[:])   # (1, L)

    bp = [bp_ref[:, k, :] for k in range(K)]               # (Tc, L)
    if Tc > 1:
        Tm = Tc - 1
        G = [bp[k][1:] for k in range(K)]                  # (Tm, L)

        s = 1
        while s < Tm:
            idk = [jnp.full((s, L), k, jnp.int32) for k in range(K)]
            Gs = [jnp.concatenate([G[k][s:], idk[k]], axis=0)
                  for k in range(K)]
            out = []
            for k in range(K):
                r = G[0]
                for p in range(1, K):
                    r = jnp.where(Gs[k] == p, G[p], r)
                out.append(r)
            G = out
            s *= 2

        pre = G[0]
        for k in range(1, K):
            pre = jnp.where(jnp.broadcast_to(s_end, (Tm, L)) == k,
                            G[k], pre)
        states_ref[:Tc - 1] = pre
        s_row0 = pre[0:1]
    else:
        s_row0 = s_end
    states_ref[Tc - 1:Tc] = s_end

    # carry for the chunk to the LEFT: s_{t-1} = bp_t[s_t] applied at
    # this chunk's first row (garbage-but-unused once the sweep ends)
    r = bp[0][0:1]
    for k in range(1, K):
        r = jnp.where(s_row0 == k, bp[k][0:1], r)
    carry_ref[:] = r


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def viterbi_pallas_tiled(log_pi: jnp.ndarray, log_A: jnp.ndarray,
                         log_obs: jnp.ndarray,
                         lengths: Optional[jnp.ndarray] = None,
                         chunk: Optional[int] = None,
                         interpret: Optional[bool] = None) -> ViterbiResult:
    """Chunked Viterbi for sequences past `viterbi_supported`'s VMEM cap
    (same results and masking semantics as ops.hmm.viterbi / the
    monolithic kernel; VMEM O(chunk) regardless of T)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, K = log_obs.shape
    Tc = chunk if chunk is not None else _pick_chunk(K)
    if Tc <= 0:
        raise ValueError(f"no VMEM-legal chunk at K={K}; use the scan path")
    log_A = _as_time_varying(log_A, B, T)
    log_A, log_obs = _mask_inputs(log_A, log_obs, lengths)

    # pad T to a chunk multiple with inert (identity/zero) steps
    padT = (-T) % Tc
    if padT:
        eye = jnp.where(jnp.eye(K, dtype=bool), 0.0, -jnp.inf
                        ).astype(log_A.dtype)
        log_A = jnp.concatenate(
            [log_A, jnp.broadcast_to(eye, (B, padT, K, K))], axis=1)
        log_obs = jnp.pad(log_obs, ((0, 0), (0, padT), (0, 0)))
    Tp = T + padT
    nC = Tp // Tc

    pad = (-B) % _LANES
    if pad:
        log_A = jnp.pad(log_A, ((0, pad), (0, 0), (0, 0), (0, 0)))
        log_obs = jnp.pad(log_obs, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad

    A_t = jnp.transpose(log_A, (1, 2, 3, 0))    # (Tp, K, K, Bp)
    obs_t = jnp.transpose(log_obs, (1, 2, 0))   # (Tp, K, Bp)
    pi = jnp.broadcast_to(log_pi[:, None], (K, Bp))

    from jax.experimental.pallas import tpu as pltpu

    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=_TILED_VMEM_LIMIT))
    grid = (Bp // _LANES, nC)
    bp, dlast = pl.pallas_call(
        functools.partial(_viterbi_fwd_tiled_kernel, Tc=Tc, K=K),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, K, Bp), jnp.int32),
            jax.ShapeDtypeStruct((K, Bp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, _LANES), lambda i, c: (0, i)),
            pl.BlockSpec((Tc, K, K, _LANES), lambda i, c: (c, 0, 0, i)),
            pl.BlockSpec((Tc, K, _LANES), lambda i, c: (c, 0, i)),
        ],
        out_specs=(
            pl.BlockSpec((Tc, K, _LANES), lambda i, c: (c, 0, i)),
            pl.BlockSpec((K, _LANES), lambda i, c: (0, i)),
        ),
        interpret=interpret,
        compiler_params=params,
    )(pi, A_t, obs_t)

    # final state + score on the (K, Bp) summary — tiny, XLA
    score = jnp.max(dlast, axis=0)
    s_last = jnp.argmax(dlast, axis=0).astype(jnp.int32)[None]  # (1, Bp)

    states = pl.pallas_call(
        functools.partial(_viterbi_bwd_tiled_kernel, Tc=Tc, K=K),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tc, K, _LANES),
                         lambda i, c: (nC - 1 - c, 0, i)),
            pl.BlockSpec((1, _LANES), lambda i, c: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((Tc, _LANES), lambda i, c: (nC - 1 - c, i)),
            pl.BlockSpec((1, _LANES), lambda i, c: (0, i)),
        ),
        interpret=interpret,
        compiler_params=params,
    )(bp, s_last)[0]

    return ViterbiResult(states.T[:B, :T], score[:B])


def viterbi_dispatchable(T: int, K: int, dtype=jnp.float32) -> bool:
    """THE auto-dispatch gate for the Viterbi kernels, kept beside them
    (CLAUDE.md: every gate must bound backend, dtype, lane tiling, AND
    VMEM — backend is probed here too so call sites cannot drift)."""
    import jax as _jax

    return (_jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and (viterbi_supported(T, K) or viterbi_tiled_supported(K)))


def viterbi_auto(log_pi: jnp.ndarray, log_A: jnp.ndarray,
                 log_obs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> ViterbiResult:
    """Route to the monolithic kernel when T fits its VMEM bound, else
    the tiled kernel, else — when no kernel is VMEM-legal (K >= 10) —
    fall back to the lax.scan path itself, so a caller that forgot the
    gate degrades gracefully instead of crashing at trace time."""
    from . import hmm as hmm_ops

    _, T, K = log_obs.shape
    if viterbi_supported(T, K):
        return viterbi_pallas(log_pi, log_A, log_obs, lengths)
    if viterbi_tiled_supported(K):
        return viterbi_pallas_tiled(log_pi, log_A, log_obs, lengths)
    return hmm_ops.viterbi(log_pi, log_A, log_obs, lengths)
