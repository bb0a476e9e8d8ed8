"""Fully-fused Viterbi decode: encoder evidence + prior MLP + the doubling
Viterbi scans in ONE VMEM-resident kernel.

The two-stage path (XLA encoder/prior -> ops/pallas_hmm.viterbi_pallas)
pays HBM round-trips for log_A (B,T,K,K) and log_obs, plus a layout
transpose — at the benchmark shape the evidence computation dominates the
decode p50.  Here everything stays in the (channels, B*T) token layout:

  * encoder conv stack + PRECISE log-softmax (ops/precise pexp/plog lower
    to pure FMA + integer bit ops inside Mosaic) -> log_obs rows (K, N);
  * prior MLP + per-row precise log-softmax -> log_A rows (K*K, N);
  * max-plus doubling prefix scan with SHIFTS ALONG LANES: rolling by s
    and refilling lanes with col%T < s handles all sequences in the block
    at once (the same boundary trick the conv taps use);
  * delta_0 is folded into the scan by seeding the t==0 lanes of the step
    matrices with rows M_0[p][m] = pi[m] + obs_0[m] (constant over p) —
    after the scan every p-row equals delta_t, no segment broadcast;
  * the final argmax is folded into the backtrace by appending a CONSTANT
    selector map at each sequence's last lane (sigma_{T-1}[k] = argmax_k
    delta_{T-1}), so the suffix composition scan lands the decoded state
    at every lane with no cross-lane gather.

Ragged lengths use the same inert-padding convention as ops/hmm
(_mask_inputs): obs -> 0 and transitions -> identity beyond each length,
so the decoded path freezes at t = L-1.

Used by VAEHMM.viterbi_decode's TPU auto-dispatch when shapes qualify
(T % 8 == 0 and a 128-divisible lane block dividing B).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .pallas_train import (_pick_block_b, full_spec,
                           pack_encoder_prior_weights, tok_spec)
from .precise import pexp, plog

Params = Dict

_NEG = -1e30


def _evidence_rows(xt_ref, ut_ref, vm_ref, col,
                   ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
                   pw1_ref, pb1_ref, pw2_ref, pb2_ref, *, T: int, K: int,
                   highest: bool = True):
    """Shared evidence computation: encoder conv stack -> precise
    log-softmax rows (K x (1, N)), prior MLP -> precise per-row
    log-softmax transition rows {(p, k): (1, N)}.  No length masking —
    callers apply their own convention."""
    f32 = jnp.float32
    x = xt_ref[:].astype(f32)
    u = ut_ref[:].astype(f32)
    vm = vm_ref[:]
    left_ok = (col > 0).astype(f32)
    right_ok = (col < T - 1).astype(f32)

    # follows the model's matmul_precision: Mosaic's default dot uses
    # single bf16 MXU passes (~1e-3 deviation class vs the XLA path at
    # "highest"); full-f32 passes restore ~1e-7 agreement and 100% decode
    # path agreement on-chip
    prec = lax.Precision.HIGHEST if highest else lax.Precision.DEFAULT

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def conv3(h, w_ref, b_ref):
        hm = jnp.roll(h, 1, axis=1) * left_ok
        hp_ = jnp.roll(h, -1, axis=1) * right_ok
        wcat = jnp.concatenate([w_ref[0], w_ref[1], w_ref[2]], axis=1)
        return dot(wcat, jnp.concatenate([hm, h, hp_], axis=0)) + b_ref[:]

    def plse(rows):
        m = functools.reduce(jnp.maximum, rows)
        msafe = jnp.maximum(m, _NEG)
        return msafe + plog(sum(pexp(r - msafe) for r in rows))

    h1 = jnp.maximum(conv3(x, ew1_ref, eb1_ref), 0.0) * vm
    h2 = jnp.maximum(conv3(h1, ew2_ref, eb2_ref), 0.0)
    logits = dot(ew3_ref[:], h2) + eb3_ref[:]           # (K, N)
    lrows = [logits[k:k + 1] for k in range(K)]
    lz = plse(lrows)
    obs = [lrows[k] - lz for k in range(K)]

    hp = jnp.maximum(dot(pw1_ref[:], u) + pb1_ref[:], 0.0)
    ap = dot(pw2_ref[:], hp) + pb2_ref[:]               # (K*K, N)
    A = {}
    for p in range(K):
        rows = [ap[p * K + k:p * K + k + 1] for k in range(K)]
        rz = plse(rows)
        for k in range(K):
            A[(p, k)] = rows[k] - rz
    return obs, A


def _kernel(xt_ref, ut_ref, mf_ref, vm_ref,
            ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
            logpi_ref, pw1_ref, pb1_ref, pw2_ref, pb2_ref,
            states_ref, *, T: int, K: int, highest: bool):
    f32 = jnp.float32
    mf = mf_ref[:]                      # (1, N) length mask
    N = xt_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, N), 1) % T
    obs_raw, A_raw = _evidence_rows(
        xt_ref, ut_ref, vm_ref, col,
        ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
        pw1_ref, pb1_ref, pw2_ref, pb2_ref, T=T, K=K, highest=highest)
    # inert padding (ops/hmm._mask_inputs): obs -> 0, A -> identity
    obs = [jnp.where(mf > 0, obs_raw[k], 0.0) for k in range(K)]
    A = {(p, k): jnp.where(mf > 0, A_raw[(p, k)],
                           0.0 if p == k else _NEG)
         for p in range(K) for k in range(K)}

    # ---- max-plus doubling prefix scan along lanes ----
    def shift_down(row, s, fill):
        return jnp.where(col < s, fill, jnp.roll(row, s, axis=1))

    # seed: t==0 lanes carry M_0[p][m] = pi[m] + obs_0[m] (constant in p)
    is0 = col == 0
    M = [[jnp.where(is0, logpi_ref[k, 0] + obs[k], A[(p, k)] + obs[k])
          for k in range(K)] for p in range(K)]
    ident_pk = [[0.0 if p == k else _NEG for k in range(K)]
                for p in range(K)]
    s = 1
    while s < T:
        Xs = [[shift_down(M[p][k], s, ident_pk[p][k]) for k in range(K)]
              for p in range(K)]
        M = [[functools.reduce(
            jnp.maximum, [Xs[p][m] + M[m][k] for m in range(K)])
            for k in range(K)] for p in range(K)]
        s *= 2
    delta = [M[0][k] for k in range(K)]                 # = delta_t, any p

    # ---- backpointers (vectorized argmax over prev state) ----
    dprev = [shift_down(delta[p], 1, 0.0) for p in range(K)]
    bp = []
    for k in range(K):
        best = dprev[0] + A[(0, k)]
        arg = jnp.zeros((1, N), jnp.int32)
        for p in range(1, K):
            sc = dprev[p] + A[(p, k)]
            take = sc > best
            best = jnp.where(take, sc, best)
            arg = jnp.where(take, p, arg)
        bp.append(arg)

    # final-state constant map at each sequence's last lane
    best = delta[0]
    s_last = jnp.zeros((1, N), jnp.int32)
    for k in range(1, K):
        take = delta[k] > best
        best = jnp.where(take, delta[k], best)
        s_last = jnp.where(take, k, s_last)

    # ---- backtrace: suffix composition scan of selector maps ----
    is_last = col == T - 1
    G = [jnp.where(is_last, s_last, jnp.roll(bp[k], -1, axis=1))
         for k in range(K)]

    def shift_up(row, s, fill):
        return jnp.where(col >= T - s, fill, jnp.roll(row, -s, axis=1))

    s = 1
    while s < T:
        Gs = [shift_up(G[k], s, k) for k in range(K)]
        newG = []
        for k in range(K):
            r = G[0]
            for p in range(1, K):
                r = jnp.where(Gs[k] == p, G[p], r)
            newG.append(r)
        G = newG
        s *= 2
    states_ref[:] = G[0]


@functools.partial(jax.jit, static_argnames=("K", "T", "block_b",
                                             "interpret", "highest"))
def _call(xt, ut, mf, vm, weights, *, K, T, block_b, interpret, highest):
    C, N = xt.shape
    U = ut.shape[0]
    NP = block_b * T

    return pl.pallas_call(
        functools.partial(_kernel, T=T, K=K, highest=highest),
        grid=(N // NP,),
        in_specs=[tok_spec(c, NP) for c in (C, U, 1, 1)]
        + [full_spec(w) for w in weights],
        out_specs=tok_spec(1, NP),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        interpret=interpret,
    )(xt, ut, mf, vm, *weights)


def supported(B: int, T: int, cfg=None) -> bool:
    """Shape gate for the one-kernel decode: lane tiling satisfiable AND
    the block working set fits the VMEM budget.  The kernel's live rows
    are the evidence stack (encoder taps + prior MLP) plus O(K^2)
    delta/bp/selector rows over block_b*T lanes — without the bound a
    long-T decode dies in the Mosaic allocator instead of falling back
    (same failure class as pallas_hmm.viterbi_supported)."""
    if T % 8 != 0:
        return False
    bb = _pick_block_b(B, T)
    if bb == 0:
        return False
    if cfg is not None:
        from .pallas_train import _train_rows_estimate, fits_vmem

        rows = _train_rows_estimate(cfg) + 8 * cfg.K * cfg.K
        return fits_vmem(rows, bb, T)
    from .pallas_train import fits_vmem

    return fits_vmem(700, bb, T)  # conservative H<=64-class bound


def _evidence_kernel(xt_ref, ut_ref, vm_ref,
                     ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
                     pw1_ref, pb1_ref, pw2_ref, pb2_ref,
                     obs_ref, logA_ref, *, T: int, K: int, highest: bool):
    N = xt_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, N), 1) % T
    obs, A = _evidence_rows(
        xt_ref, ut_ref, vm_ref, col,
        ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
        pw1_ref, pb1_ref, pw2_ref, pb2_ref, T=T, K=K, highest=highest)
    obs_ref[:] = jnp.concatenate(obs, axis=0)
    logA_ref[:] = jnp.concatenate(
        [A[(p, k)] for p in range(K) for k in range(K)], axis=0)


@functools.partial(jax.jit, static_argnames=("K", "T", "block_b",
                                             "interpret", "highest"))
def _evidence_call(xt, ut, vm, weights, *, K, T, block_b, interpret,
                   highest):
    C, N = xt.shape
    U = ut.shape[0]
    NP = block_b * T

    return pl.pallas_call(
        functools.partial(_evidence_kernel, T=T, K=K, highest=highest),
        grid=(N // NP,),
        in_specs=[tok_spec(c, NP) for c in (C, U, 1)]
        + [full_spec(w) for w in weights],
        out_specs=(tok_spec(K, NP), tok_spec(K * K, NP)),
        out_shape=(jax.ShapeDtypeStruct((K, N), jnp.float32),
                   jax.ShapeDtypeStruct((K * K, N), jnp.float32)),
        interpret=interpret,
    )(xt, ut, vm, *weights)


@functools.partial(jax.jit, static_argnames=("model", "interpret"))
def fused_evidence(model, params: Params, x: jnp.ndarray, u: jnp.ndarray,
                   lengths=None, interpret: bool | None = None):
    """One-kernel twin of (model.prior, model._hmm_evidence): returns
    (log_pi (K,), log_A (B,T,K,K), log_obs (B,T,K)) ready for the exact
    HMM scans — cuts the exact-inference paths' dominant evidence cost
    (BENCH_NOTES.md)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cfg = model.cfg
    B, C, T = x.shape
    K = cfg.K
    block_b = _pick_block_b(B, T) if not interpret \
        else (B if B <= 8 else math.gcd(B, 8))
    if T % 8 != 0 or block_b == 0:
        raise ValueError(f"fused evidence unsupported at B={B}, T={T}")
    if u.ndim == 3 and u.shape[1] != cfg.u_dim:
        u = jnp.transpose(u, (0, 2, 1))

    N = B * T
    f32 = jnp.float32
    xt = jnp.transpose(x.astype(f32), (1, 0, 2)).reshape(C, N)
    ut = jnp.transpose(u.astype(f32), (1, 0, 2)).reshape(u.shape[1], N)
    tcol = jnp.arange(T, dtype=jnp.int32)[None, :]
    if lengths is None:
        vm = jnp.ones((1, N), f32)
    else:
        valid_to = jnp.max(lengths)
        vm = jnp.broadcast_to((tcol < valid_to).astype(f32),
                              (B, T)).reshape(1, N)

    weights = pack_encoder_prior_weights(params)
    logpi_col = weights[6]
    obs, logA = _evidence_call(
        xt, ut, vm, weights[:6] + weights[7:], K=K, T=T, block_b=block_b,
        interpret=interpret,
        highest=model.cfg.matmul_precision == "highest")
    log_obs = jnp.transpose(obs.reshape(K, B, T), (1, 2, 0))
    log_A = jnp.transpose(logA.reshape(K, K, B, T), (2, 3, 0, 1))
    return logpi_col[:, 0], log_A, log_obs


@functools.partial(jax.jit, static_argnames=("model", "interpret"))
def fused_viterbi_states(model, params: Params, x: jnp.ndarray,
                         u: jnp.ndarray, lengths=None,
                         interpret: bool | None = None) -> jnp.ndarray:
    """End-to-end MAP decode (B, T) — one kernel from raw (x, u) to
    states.  Matches the two-stage path (precise evidence + max-plus
    recursion) up to float-rounding path ties."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cfg = model.cfg
    B, C, T = x.shape
    K = cfg.K
    block_b = _pick_block_b(B, T) if not interpret \
        else (B if B <= 8 else math.gcd(B, 8))
    if T % 8 != 0 or block_b == 0:
        raise ValueError(f"fused decode unsupported at B={B}, T={T}")
    if u.ndim == 3 and u.shape[1] != cfg.u_dim:
        u = jnp.transpose(u, (0, 2, 1))

    N = B * T
    f32 = jnp.float32
    xt = jnp.transpose(x.astype(f32), (1, 0, 2)).reshape(C, N)
    ut = jnp.transpose(u.astype(f32), (1, 0, 2)).reshape(u.shape[1], N)
    tcol = jnp.arange(T, dtype=jnp.int32)[None, :]
    if lengths is None:
        mf = jnp.ones((1, N), f32)
        vm = jnp.ones((1, N), f32)
    else:
        mf = (tcol < lengths[:, None]).astype(f32).reshape(1, N)
        valid_to = jnp.max(lengths)
        vm = jnp.broadcast_to((tcol < valid_to).astype(f32),
                              (B, T)).reshape(1, N)

    weights = pack_encoder_prior_weights(params)
    states = _call(xt, ut, mf, vm, weights, K=K, T=T, block_b=block_b,
                   interpret=interpret,
                   highest=model.cfg.matmul_precision == "highest")
    return states.reshape(B, T)
