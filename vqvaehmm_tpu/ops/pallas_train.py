"""Fused training step: the ENTIRE VAE-HMM negative-ELBO forward AND all
parameter gradients in one VMEM-resident Pallas kernel.

Why: the XLA train step is bandwidth-bound — HLO cost analysis shows
2.65 GFLOP but ~377 MB of HBM traffic per step (BENCH_NOTES.md), because
every fusion boundary round-trips (B, C, T) activations through HBM in both
the forward and backward passes.  This kernel keeps every activation in
VMEM: per step it reads x, u, the masks and the parameters, and writes only
three loss partials plus the (tiny, ~130 KB) parameter gradients.  That
turns a ~200 us memory-bound step into a compute-bound one.

Design (per grid step = one batch block, grid sequential on TPU):
  * layout (channels, BB*T) — channels on sublanes, tokens on lanes — the
    same formulation as ops/pallas_encoder.py; k=3 SAME convs are three
    shifted (O, I) @ (I, N) MXU matmuls with sequence-boundary lane masks.
  * forward recomputes nothing: encoder -> softmax -> soft codebook ->
    decoder -> masked Gaussian NLL, plus the u-conditioned prior MLP,
    transition cross terms and entropy (reference loss semantics:
    VQ_VAE_HMM_fixed.py:106-137, identical normalizations — the scales
    arrive precomputed as a (1, 128) VMEM block via full_spec).
  * backward is hand-derived in-kernel (softmax/log-softmax VJPs in closed
    form, conv taps transposed); weight-gradient and loss-partial outputs
    are accumulated across grid steps (TPU grids are sequential).
  * gradients of the inputs x, u are NOT computed (training needs only
    parameter gradients).

Numerics: float32 throughout with MXU matmuls (preferred_element_type=
float32); exp/log are this XLA build's fast-math transcendentals (~1.2e-4),
the same accuracy class as the throughput training config.  Parity runs
(<=1e-4 vs torch) keep using the XLA path with precise kernels.

Used via make_train_step(model, tx, fused=True) — grads match
jax.grad(compute_loss) (tests/test_pallas_train.py).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

Params = Dict

_LOG2PI = math.log(2.0 * math.pi)


def _make_dots(bf16_matmuls: bool):
    """MXU matmul helpers, f32 accumulate.  bf16_matmuls casts the INPUTS
    to bfloat16 (one MXU pass — the same precision class as XLA's default
    matmul precision used by the fast training config); elementwise math
    stays float32 either way.

    NOTE: unlike the inference kernels, the f32 mode deliberately keeps
    Mosaic's default dots: Precision.HIGHEST multi-pass scratch blows the
    fwd+bwd kernel past the 16 MB scoped-VMEM limit at the benchmark
    shapes (measured 50.2 MB at block_b=16).  The fused train step is a
    THROUGHPUT path; <=1e-4 parity runs use the XLA step (module
    docstring)."""
    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16_matmuls \
        else (lambda a: a)
    prec = None

    def dot(a, b):
        # (M, K) @ (K, N)
        return jnp.dot(cast(a), cast(b),
                       preferred_element_type=jnp.float32, precision=prec)

    def dot_nt(a, b):
        # contract the lane (token) axis of both: (M, N) x (C, N) -> (M, C)
        return lax.dot_general(cast(a), cast(b), (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)

    return dot, dot_nt


def _kernel(  # noqa: C901 — one kernel, one pass, intentionally linear
        xt_ref, ut_ref, mf_ref, vm_ref, pm_ref,
        ew1_ref, eb1_ref, ew2_ref, eb2_ref, ew3_ref, eb3_ref,
        logpi_ref, pw1_ref, pb1_ref, pw2_ref, pb2_ref,
        embT_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
        scales_ref,
        # outputs (accumulated across the sequential grid)
        partials_ref,
        gew1_ref, geb1_ref, gew2_ref, geb2_ref, gew3_ref, geb3_ref,
        glogpi_ref, gpw1_ref, gpb1_ref, gpw2_ref, gpb2_ref,
        gembT_ref, gdw1_ref, gdb1_ref, gdw2_ref, gdb2_ref, gdw3_ref,
        gdb3_ref,
        *, T: int, K: int, bf16_matmuls: bool):
    f32 = jnp.float32
    _dot, _dot_nt = _make_dots(bf16_matmuls)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (partials_ref, gew1_ref, geb1_ref, gew2_ref, geb2_ref,
                  gew3_ref, geb3_ref, glogpi_ref, gpw1_ref, gpb1_ref,
                  gpw2_ref, gpb2_ref, gembT_ref, gdw1_ref, gdb1_ref,
                  gdw2_ref, gdb2_ref, gdw3_ref, gdb3_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    # Activations stay f32: an experiment storing the large intermediates
    # in bf16 (halving roll/taps/mask traffic) measured only ~1.5% faster
    # — the kernel is not limited by VPU data width — so the extra
    # rounding drift isn't bought by anything (BENCH_NOTES.md).  Matmul
    # INPUTS are still cast to bf16 in the fast mode via _make_dots.
    adt = f32

    def A_(a):
        return a.astype(adt) if a.dtype != adt else a

    x = xt_ref[:].astype(f32)          # (C, N) f32 for the NLL
    ua = A_(ut_ref[:].astype(f32))     # (U, N)
    mf = mf_ref[:]                     # (1, N) sequence mask
    vm = vm_ref[:]                     # (1, N) valid_to mask
    pm = pm_ref[:]                     # (1, N) pairwise transition mask
    vma = A_(vm)
    # encoder input masked at t >= valid_to, matching VAEHMM.encode: the
    # S_p conv tap at lane valid_to-1 would otherwise read x[valid_to]
    # (leaks a non-zero tail into the valid region AND into the conv1
    # weight grads below).  The NLL keeps raw x — the loss mask covers it.
    xa = A_(x) * vma
    s_r = scales_ref[0, 0]             # 1 / max(sum(mask)*C, 1)
    s_p = scales_ref[0, 1]             # -beta / B
    s_h = scales_ref[0, 2]             # +beta / B   (q*logq term)

    N = x.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, N), 1) % T
    left_f = col > 0
    right_f = col < T - 1
    im = (col == 0).astype(f32)        # t == 0 positions

    def S_m(h):   # h[t-1], zero-padded at sequence starts
        return jnp.roll(h, 1, axis=1) * left_f.astype(h.dtype)

    def S_p(h):   # h[t+1], zero-padded at sequence ends
        return jnp.roll(h, -1, axis=1) * right_f.astype(h.dtype)

    def taps(h):
        """Stack the three shifted views on sublanes: (3*C, N) — turns a
        k=3 conv into ONE (O, 3C) @ (3C, N) MXU call instead of three
        small-K calls."""
        return jnp.concatenate([S_m(h), h, S_p(h)], axis=0)

    def conv3(h, w_ref, b_ref):
        wcat = jnp.concatenate([w_ref[0], w_ref[1], w_ref[2]], axis=1)
        return _dot(wcat, taps(h)) + b_ref[:]

    def conv3_bwd(dy, h_in, w_ref, gw_ref, gb_ref):
        """Accumulate weight/bias grads; return grad wrt h_in."""
        dy = A_(dy)
        I = h_in.shape[0]
        gw = _dot_nt(dy, taps(h_in))            # (O, 3I)
        gw_ref[0, :, :] += gw[:, :I]
        gw_ref[1, :, :] += gw[:, I:2 * I]
        gw_ref[2, :, :] += gw[:, 2 * I:]
        # bias grad accumulates in f32 (a plain bf16 jnp.sum would
        # accumulate in bf16 over thousands of terms)
        gb_ref[:, :] += jnp.sum(dy.astype(jnp.float32), axis=1,
                                keepdims=True)
        # dh[s] = sum_dt w_dt^T dy[s - dt]: stack the opposite shifts of dy
        dycat = jnp.concatenate([S_p(dy), dy, S_m(dy)], axis=0)  # (3O, N)
        wT = jnp.concatenate([w_ref[0].T, w_ref[1].T, w_ref[2].T], axis=1)
        return _dot(wT, dycat)

    def relu_a(r, mask_in=None):
        """ReLU in f32, stored in the activation dtype, plus the
        backward mask (computed by an f32 comparison — this target has
        no bf16 vector compare)."""
        h = A_(jnp.maximum(r, 0.0))
        m = A_((r > 0.0).astype(f32))
        if mask_in is not None:
            h = h * mask_in
            m = m * mask_in
        return h, m

    # ---------------- forward: encoder ----------------
    h1, m_h1 = relu_a(conv3(xa, ew1_ref, eb1_ref), vma)       # (H1, N)
    h2, m_h2 = relu_a(conv3(h1, ew2_ref, eb2_ref))            # (H2, N)
    logits = _dot(ew3_ref[:], h2) + eb3_ref[:]                # (K, N)
    lmax = jnp.max(logits, axis=0, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - lmax), axis=0,
                          keepdims=True)) + lmax
    logq = logits - lse
    q = jnp.exp(logq)                                         # (K, N)

    # ---------------- forward: prior ----------------
    hp, m_hp = relu_a(_dot(pw1_ref[:], ua) + pb1_ref[:])      # (HP, N)
    ap = _dot(pw2_ref[:], hp) + pb2_ref[:]                    # (K*K, N)
    logA_rows = []
    for i in range(K):
        g = ap[i * K:(i + 1) * K]
        gmax = jnp.max(g, axis=0, keepdims=True)
        glse = jnp.log(jnp.sum(jnp.exp(g - gmax), axis=0,
                               keepdims=True)) + gmax
        logA_rows.append(g - glse)
    logA = jnp.concatenate(logA_rows, axis=0)                 # (K*K, N)

    # ---------------- forward: decoder ----------------
    e = A_(_dot(embT_ref[:], q)) * vma                        # (D, N)
    hd1, m_hd1 = relu_a(conv3(e, dw1_ref, db1_ref), vma)      # (D, N)
    hd2, m_hd2 = relu_a(conv3(hd1, dw2_ref, db2_ref))         # (D, N)
    out = _dot(dw3_ref[:], hd2) + db3_ref[:]                  # (2C, N)
    C = x.shape[0]
    mu = out[:C]
    logv = out[C:]
    ev = jnp.exp(logv)
    var = jnp.maximum(ev, 1e-8)
    notclamped = (ev > 1e-8).astype(f32)
    diff = mu - x
    nll = 0.5 * (_LOG2PI + jnp.log(var) + diff * diff / var)  # (C, N)
    p_nll = jnp.sum(nll * mf)

    # ---------------- forward: prior expectation + entropy ----------------
    logpi = logpi_ref[:]                                      # (K, 1)
    p_init = jnp.sum(q * im * logpi)
    qprev = S_m(q)                                            # q[:, t-1]
    trans = jnp.zeros((1, N), f32)
    for i in range(K):
        for j in range(K):
            trans += qprev[i:i + 1] * q[j:j + 1] * logA[i * K + j:i * K
                                                        + j + 1]
    p_trans = jnp.sum(trans * pm)
    p_qlogq = jnp.sum(jnp.sum(q * logq, axis=0, keepdims=True) * mf)

    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pvec = (jnp.where(lane == 0, p_nll, 0.0)
            + jnp.where(lane == 1, p_init + p_trans, 0.0)
            + jnp.where(lane == 2, p_qlogq, 0.0))
    partials_ref[:] += pvec

    # ================= backward =================
    # reconstruction -> decoder stack
    dmu = s_r * mf * diff / var                               # (C, N)
    dlogv = s_r * mf * 0.5 * (1.0 - diff * diff / var) * notclamped
    dout = jnp.concatenate([dmu, dlogv], axis=0)              # (2C, N)
    gdw3_ref[:, :] += _dot_nt(dout, hd2)
    gdb3_ref[:, :] += jnp.sum(dout, axis=1, keepdims=True)
    dhd2 = A_(_dot(dw3_ref[:].T, dout))
    db2d = dhd2 * m_hd2
    dhd1 = A_(conv3_bwd(db2d, hd1, dw2_ref, gdw2_ref, gdb2_ref))
    db1d = dhd1 * m_hd1   # folds in vm
    de = conv3_bwd(db1d, e, dw1_ref, gdw1_ref, gdb1_ref).astype(f32) * vm
    gembT_ref[:, :] += _dot_nt(de, q)
    dq_dec = _dot(embT_ref[:].T, de)                          # (K, N)

    # prior expectation -> q, logA, logpi
    glogpi_ref[:, :] += s_p * jnp.sum(q * im, axis=1, keepdims=True)
    dq_pri = s_p * im * logpi                                 # init term
    pm_sp = s_p * pm
    dlogA_rows = []
    dqprev_rows = []
    for i in range(K):
        acc_i = jnp.zeros((1, N), f32)
        for j in range(K):
            dlogA_rows.append(pm_sp * qprev[i:i + 1] * q[j:j + 1])
            acc_i += q[j:j + 1] * logA[i * K + j:i * K + j + 1]
        dqprev_rows.append(pm_sp * acc_i)
    dlogA = jnp.concatenate(dlogA_rows, axis=0)               # (K*K, N)
    dqprev = jnp.concatenate(dqprev_rows, axis=0)             # (K, N)
    dq_trans_rows = []
    for j in range(K):
        acc_j = jnp.zeros((1, N), f32)
        for i in range(K):
            acc_j += qprev[i:i + 1] * logA[i * K + j:i * K + j + 1]
        dq_trans_rows.append(pm_sp * acc_j)
    dq_trans = jnp.concatenate(dq_trans_rows, axis=0)         # (K, N)
    # qprev = S_m(q)  =>  dq[t] += dqprev[t+1] (masked at sequence ends)
    dq_pri = dq_pri + dq_trans + S_p(dqprev)

    # entropy term: s_h * sum(mf * q * logq)
    dq_ent = s_h * mf * logq
    dlogq = s_h * mf * q

    # q = exp(logq), logq = log_softmax(logits)
    g_q = dq_dec + dq_pri + dq_ent
    dlogq_tot = dlogq + g_q * q
    colsum = jnp.sum(dlogq_tot, axis=0, keepdims=True)
    dlogits = dlogq_tot - q * colsum

    # encoder stack
    gew3_ref[:, :] += _dot_nt(dlogits, h2)
    geb3_ref[:, :] += jnp.sum(dlogits, axis=1, keepdims=True)
    dh2 = A_(_dot(ew3_ref[:].T, dlogits))
    da2 = dh2 * m_h2
    dh1 = A_(conv3_bwd(da2, h1, ew2_ref, gew2_ref, geb2_ref)) \
        * vma
    da1 = dh1 * m_h1
    # input grads not needed; accumulate conv1 weight grads only
    gew1_ref[0, :, :] += _dot_nt(da1, S_m(xa))
    gew1_ref[1, :, :] += _dot_nt(da1, xa)
    gew1_ref[2, :, :] += _dot_nt(da1, S_p(xa))
    geb1_ref[:, :] += jnp.sum(da1.astype(f32), axis=1, keepdims=True)

    # prior MLP: logA = per-row log_softmax(ap)
    dap_groups = []
    for i in range(K):
        g = dlogA[i * K:(i + 1) * K]
        A = jnp.exp(logA[i * K:(i + 1) * K])
        gsum = jnp.sum(g, axis=0, keepdims=True)
        dap_groups.append(g - A * gsum)
    dap = jnp.concatenate(dap_groups, axis=0)                 # (K*K, N)
    gpw2_ref[:, :] += _dot_nt(dap, hp)
    gpb2_ref[:, :] += jnp.sum(dap, axis=1, keepdims=True)
    dhp = A_(_dot(pw2_ref[:].T, dap))
    dap1 = dhp * m_hp
    gpw1_ref[:, :] += _dot_nt(dap1, ua)
    gpb1_ref[:, :] += jnp.sum(dap1.astype(f32), axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("K", "T", "block_b", "interpret",
                                    "bf16_matmuls", "vmem_limit"))
def _fused_call(xt, ut, mf, vm, pm, weights, scales, *, K: int, T: int,
                block_b: int, interpret: bool, bf16_matmuls: bool,
                vmem_limit: int | None = None):
    (ew1, eb1, ew2, eb2, ew3, eb3, logpi, pw1, pb1, pw2, pb2,
     embT, dw1, db1, dw2, db2, dw3, db3) = weights
    C, N = xt.shape
    U = ut.shape[0]
    H1, H2 = ew1.shape[1], ew2.shape[1]
    HP = pw1.shape[0]
    D = embT.shape[0]
    NB = N // (block_b * T)
    NP = block_b * T

    in_specs = [tok_spec(c, NP) for c in (C, U, 1, 1, 1)]
    in_specs += [full_spec(w) for w in weights]
    in_specs += [full_spec(scales)]  # (1, 128) scale row, same every step

    out_shapes = [
        jax.ShapeDtypeStruct((1, 128), jnp.float32),       # partials
        jax.ShapeDtypeStruct((3, H1, C), jnp.float32),     # gew1
        jax.ShapeDtypeStruct((H1, 1), jnp.float32),
        jax.ShapeDtypeStruct((3, H2, H1), jnp.float32),    # gew2
        jax.ShapeDtypeStruct((H2, 1), jnp.float32),
        jax.ShapeDtypeStruct((K, H2), jnp.float32),        # gew3
        jax.ShapeDtypeStruct((K, 1), jnp.float32),
        jax.ShapeDtypeStruct((K, 1), jnp.float32),         # glogpi
        jax.ShapeDtypeStruct((HP, U), jnp.float32),        # gpw1
        jax.ShapeDtypeStruct((HP, 1), jnp.float32),
        jax.ShapeDtypeStruct((K * K, HP), jnp.float32),    # gpw2
        jax.ShapeDtypeStruct((K * K, 1), jnp.float32),
        jax.ShapeDtypeStruct((D, K), jnp.float32),         # gembT
        jax.ShapeDtypeStruct((3, D, D), jnp.float32),      # gdw1
        jax.ShapeDtypeStruct((D, 1), jnp.float32),
        jax.ShapeDtypeStruct((3, D, D), jnp.float32),      # gdw2
        jax.ShapeDtypeStruct((D, 1), jnp.float32),
        jax.ShapeDtypeStruct((2 * C, D), jnp.float32),     # gdw3
        jax.ShapeDtypeStruct((2 * C, 1), jnp.float32),
    ]
    out_specs = [full_spec(s) for s in out_shapes]

    cp = None
    if vmem_limit and not interpret:
        from jax.experimental.pallas import tpu as pltpu

        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    return pl.pallas_call(
        functools.partial(_kernel, T=T, K=K, bf16_matmuls=bf16_matmuls),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=cp,
    )(xt, ut, mf, vm, pm, *weights, scales)


def pack_encoder_prior_weights(p: Params):
    """Kernel-layout views of the encoder + prior parameters (per-tap
    (W, O, I) conv stacks, column biases, precise log_pi) — the single
    source of truth shared by the fused train step (as the prefix of its
    weight tuple) and the fused decode kernel (ops/pallas_decode.py)."""
    from .precise import plog_softmax

    f32 = jnp.float32
    logpi = plog_softmax(p["prior"]["log_prior"].astype(f32))[:, None]
    return (
        jnp.transpose(p["encoder"]["conv1"]["weight"], (2, 0, 1)).astype(f32),
        p["encoder"]["conv1"]["bias"][:, None].astype(f32),
        jnp.transpose(p["encoder"]["conv2"]["weight"], (2, 0, 1)).astype(f32),
        p["encoder"]["conv2"]["bias"][:, None].astype(f32),
        p["encoder"]["to_logits"]["weight"][:, :, 0].astype(f32),
        p["encoder"]["to_logits"]["bias"][:, None].astype(f32),
        logpi,
        p["prior"]["fc1"]["weight"].astype(f32),
        p["prior"]["fc1"]["bias"][:, None].astype(f32),
        p["prior"]["fc2"]["weight"].astype(f32),
        p["prior"]["fc2"]["bias"][:, None].astype(f32),
    )


def _pick_block_b(B: int, T: int, rows: int | None = None,
                  budget_bytes: int | None = None) -> int:
    """Batch block whose lane count (block_b * T) is 128-divisible
    (Mosaic requires lane blocks % 128 == 0) and which divides B.

    Without `rows`: the smallest legal block (the historical default).
    With `rows` (a live-row estimate for the kernel): the LARGEST legal
    block that still fits the VMEM budget — wider lane dims per MXU pass
    and fewer grid steps of gradient accumulation.  Measured at the
    production probe shape (B=256, T=512, K=8): block_b 1 -> 4 is ~6.5%
    faster (4777 -> 4487 us/step, BENCH_NOTES.md "Production-scale
    block sweep"); with the raised train VMEM limit, 4 -> 16 banks a
    further ~3% ("Raised scoped-VMEM limit")."""
    bb0 = 128 // math.gcd(T, 128)
    legal = [k * bb0 for k in range(1, B // bb0 + 1) if B % (k * bb0) == 0]
    if not legal:
        return 0
    if rows is None:
        return legal[0]
    fitting = [bb for bb in legal if fits_vmem(rows, bb, T, budget_bytes)]
    return max(fitting) if fitting else 0


# Conservative VMEM budget for a kernel's live activations; past this the
# Mosaic allocator fails at compile time, so the caller should take the
# XLA path instead (measured: the benchmark model at block_b=16 fits,
# block_b=32 does not — BENCH_NOTES.md).  Applies to kernels running
# under Mosaic's default 16 MB scoped limit (encoder/infer/decode).
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024

# The fused TRAIN kernel runs with an explicitly raised scoped-VMEM
# limit instead (CompilerParams(vmem_limit_bytes=...)): a sequential-
# grid fwd+bwd kernel can afford a large working set on a 128 MB-VMEM
# v5e, and the wider batch blocks it unlocks measure up to ~3% faster
# (never slower) — BENCH_NOTES.md "Raised scoped-VMEM limit".  The
# 48 MB budget keeps a 16 MB margin of the 64 MB limit for pipeline
# buffers and row-estimate error.
_TRAIN_VMEM_LIMIT = 64 * 1024 * 1024
_TRAIN_VMEM_BUDGET = 48 * 1024 * 1024


def fits_vmem(rows: int, block_b: int, T: int,
              budget_bytes: int | None = None) -> bool:
    """Shared VMEM guard for the token-layout kernels: True when a block
    with `rows` live f32 sublane-rows over block_b*T lanes fits the
    budget.  (Single source of truth for pallas_train/encoder/infer's
    supported() predicates; pass budget_bytes=_TRAIN_VMEM_BUDGET for the
    raised-limit train kernel.)"""
    if budget_bytes is None:
        budget_bytes = _VMEM_BUDGET_BYTES
    return rows * block_b * T * 4 <= budget_bytes


def tok_spec(c: int, NP: int):
    """BlockSpec for a (c, N) token-layout array blocked over lanes."""
    return pl.BlockSpec((c, NP), lambda i: (0, i))


def full_spec(a):
    """BlockSpec replicating a whole (weight) array to every grid step."""
    nd = a.ndim
    return pl.BlockSpec(a.shape, lambda i, nd=nd: (0,) * nd)


def _train_rows_estimate(cfg) -> int:
    """Rough live-row count (channels on sublanes) of the fused train
    kernel's working set: taps-stacked conv inputs dominate."""
    D, H1, H2 = cfg.hidden_dim, cfg.hidden_dim, cfg.hidden_dim2
    HP = cfg.trans_hidden
    K = cfg.K
    return (6 * D + 3 * H1 + 2 * H2 + 2 * HP + 4 * cfg.input_dim
            + (cfg.u_dim or 1) + 4 * K * K + 6 * K + 16)


def train_step_supported(cfg, B: int, T: int) -> bool:
    """True when the fused train kernel can run at these shapes (lane
    tiling satisfiable AND the working set fits the VMEM budget)."""
    if T % 8 != 0:
        return False
    bb = _pick_block_b(B, T)
    return bb != 0 and fits_vmem(_train_rows_estimate(cfg), bb, T,
                                 _TRAIN_VMEM_BUDGET)


def fused_loss_and_grads(model, params: Params, x: jnp.ndarray,
                         u: jnp.ndarray, lengths: jnp.ndarray,
                         beta, *, block_b: int | None = None,
                         interpret: bool | None = None,
                         axis_name: str | None = None,
                         vmem_limit: int | None = None,
                         tokens: Tuple[jnp.ndarray, jnp.ndarray]
                         | None = None
                         ) -> Tuple[jnp.ndarray, Params]:
    """Drop-in replacement for jax.value_and_grad(model.compute_loss):
    returns (loss, grads) with grads in the model's param-pytree layout.

    Requirements: T % 8 == 0 and a batch block with block_b*T % 128 == 0
    dividing B must exist (the benchmark/training shapes satisfy both —
    otherwise use the XLA path).

    axis_name: set when called per-shard inside shard_map over a
    data-parallel mesh — the loss normalizations (mask total, batch size,
    valid_to) become GLOBAL via psum/pmax so the sharded update is
    bit-consistent with the single-device one, and the returned loss/grads
    are the psum'd globals (replicated).

    tokens: optional pre-tokenized inputs (xt:(C, B*T), ut:(U, B*T)) in
    the kernel's own token-major layout; x and u are then ignored (pass
    None).  This is the device-sampler fast path — the Pallas gather
    kernel (ops/pallas_gather.py) emits this layout directly, skipping
    the per-step (B, C, T) transpose.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if vmem_limit is None:
        vmem_limit = _TRAIN_VMEM_LIMIT
    cfg = model.cfg
    f32 = jnp.float32
    if tokens is not None:
        xt, ut = tokens
        B = lengths.shape[0]
        C = xt.shape[0]
        if xt.shape[1] % B != 0 or ut.shape[1] != xt.shape[1]:
            # T would silently floor to a wrong value, putting sequence
            # boundaries in the wrong lanes (cross-sequence roll
            # contamination) — e.g. global lengths with per-shard tokens
            raise ValueError(
                f"tokens lane count {xt.shape[1]} (u: {ut.shape[1]}) "
                f"is not a multiple of B={B} from lengths; tokens and "
                "lengths must describe the same (local) batch")
        T = xt.shape[1] // B
    else:
        B, C, T = x.shape
    K = cfg.K
    if block_b is None:
        block_b = (_pick_block_b(B, T, rows=_train_rows_estimate(cfg),
                                 budget_bytes=_TRAIN_VMEM_BUDGET)
                   if not interpret
                   else (B if B <= 8 else math.gcd(B, 8)))
    if T % 8 != 0 or block_b == 0 or B % block_b != 0 \
            or (not interpret and (block_b * T) % 128 != 0):
        raise ValueError(f"fused step unsupported at B={B}, T={T} "
                         f"(block_b={block_b}); use the XLA path")
    N = B * T
    if tokens is None:
        if u.ndim == 3 and u.shape[1] != cfg.u_dim:
            u = jnp.transpose(u, (0, 2, 1))  # (B,T,U) -> (B,U,T)
        xt = jnp.transpose(x.astype(f32), (1, 0, 2)).reshape(C, N)
        ut = jnp.transpose(u.astype(f32), (1, 0, 2)).reshape(u.shape[1], N)
    else:
        xt = xt.astype(f32)
        ut = ut.astype(f32)

    tcol = jnp.arange(T, dtype=jnp.int32)[None, :]
    mask = (tcol < lengths[:, None]).astype(f32)              # (B, T)
    valid_to = jnp.max(lengths)
    mask_sum = mask.sum()
    B_total = B
    if axis_name is not None:
        valid_to = lax.pmax(valid_to, axis_name)
        mask_sum = lax.psum(mask_sum, axis_name)
        B_total = B * lax.psum(1, axis_name)
    vmask = jnp.broadcast_to((tcol < valid_to).astype(f32),
                             (B, T)).reshape(1, N)
    pmask_bt = jnp.concatenate(
        [jnp.zeros((B, 1), f32), mask[:, 1:] * mask[:, :-1]], axis=1)
    mf = mask.reshape(1, N)
    pm = pmask_bt.reshape(1, N)

    beta = jnp.asarray(beta, f32)
    denom = jnp.maximum(mask_sum * C, 1.0)
    scales = jnp.zeros((1, 128), f32)
    scales = scales.at[0, 0].set(1.0 / denom)
    scales = scales.at[0, 1].set(-beta / B_total)
    scales = scales.at[0, 2].set(beta / B_total)

    p = params
    weights = pack_encoder_prior_weights(p) + (
        p["decoder"]["embeddings"]["weight"].T.astype(f32),
        jnp.transpose(p["decoder"]["conv1"]["weight"], (2, 0, 1)).astype(f32),
        p["decoder"]["conv1"]["bias"][:, None].astype(f32),
        jnp.transpose(p["decoder"]["conv2"]["weight"], (2, 0, 1)).astype(f32),
        p["decoder"]["conv2"]["bias"][:, None].astype(f32),
        p["decoder"]["to_params"]["weight"][:, :, 0].astype(f32),
        p["decoder"]["to_params"]["bias"][:, None].astype(f32),
    )

    bf16_matmuls = getattr(model, 'compute_dtype', jnp.float32) == jnp.bfloat16
    outs = _fused_call(xt, ut, mf, vmask, pm, weights, scales,
                       K=K, T=T, block_b=block_b, interpret=interpret,
                       bf16_matmuls=bf16_matmuls, vmem_limit=vmem_limit)
    (partials, gew1, geb1, gew2, geb2, gew3, geb3, glogpi, gpw1, gpb1,
     gpw2, gpb2, gembT, gdw1, gdb1, gdw2, gdb2, gdw3, gdb3) = outs

    loss = (partials[0, 0] / denom
            + (-beta / B_total) * partials[0, 1]
            + (beta / B_total) * partials[0, 2])

    # chain logpi = log_softmax(log_prior):
    # d log_prior = g - softmax(log_prior) * sum(g)
    pi = jax.nn.softmax(p["prior"]["log_prior"].astype(f32))
    g = glogpi[:, 0]
    glog_prior = g - pi * g.sum()

    def conv_layout(gw, gb):
        return {"weight": jnp.transpose(gw, (1, 2, 0)),
                "bias": gb[:, 0]}

    grads = {
        "encoder": {
            "conv1": conv_layout(gew1, geb1),
            "conv2": conv_layout(gew2, geb2),
            "to_logits": {"weight": gew3[:, :, None], "bias": geb3[:, 0]},
        },
        "prior": {
            "log_prior": glog_prior,
            "fc1": {"weight": gpw1, "bias": gpb1[:, 0]},
            "fc2": {"weight": gpw2, "bias": gpb2[:, 0]},
        },
        "decoder": {
            "embeddings": {"weight": gembT.T},
            "conv1": conv_layout(gdw1, gdb1),
            "conv2": conv_layout(gdw2, gdb2),
            "to_params": {"weight": gdw3[:, :, None], "bias": gdb3[:, 0]},
        },
    }
    if axis_name is not None:
        # shard-local contributions (already globally scaled) -> globals;
        # the log_prior chain above is linear in g, so psum-after is exact
        loss = lax.psum(loss, axis_name)
        grads = jax.tree_util.tree_map(
            lambda a: lax.psum(a, axis_name), grads)
    return loss, grads

