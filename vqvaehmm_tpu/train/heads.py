"""Two-stage head training: frozen VAE-HMM posterior -> downstream model.

THE framework-defining dataflow (SURVEY.md section 3.2): stage-2 models
never backprop into the VAE.  Covers the reference's
* train_portfolio            (training.py:126-163) — cosine LR, clip 1.0,
  prev_weights turnover chaining across batches
* train_portfolio_optimizer  (VQ_VAE_HMM_fixed.py:230-250) — simple variant
* train_delta_hedger         (delta_hedger.py:203-235)

The frozen posterior is jax.lax.stop_gradient + a jitted encode — the
reference's torch.no_grad() equivalent without a second graph.

Batches must be FULL windows: the reference trains heads on complete
fixed-length windows (training.py:126-163) and these trainers take the
posterior over the whole array (pointwise heads read t = T-1), so a
padded batch would train on padding — lengths < T is rejected loudly.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.portfolio import delta_hedge_loss, portfolio_loss, sharpe_loss
from ..models.vae_hmm import VAEHMM


class HeadTrainResult(NamedTuple):
    params: Dict
    history: list


def _require_full_windows(batches):
    """Head trainers consume complete windows (module docstring): a
    ragged batch would silently train pointwise heads on padding."""
    for i, (x, _, lengths) in enumerate(batches):
        T = np.asarray(x).shape[-1]
        if lengths is not None and (np.asarray(lengths) < T).any():
            raise ValueError(
                f"batch {i} has lengths < T={T}: head trainers require "
                "full windows (pointwise heads read t = T-1, which would "
                "be padding)")


def train_portfolio(head_model, head_params, vae_model: VAEHMM, vae_params,
                    batches, returns_data, num_epochs: int = 100,
                    lr: float = 0.001, use_scheduler: bool = True,
                    loss_fn: Optional[Callable] = None,
                    gradient_clip: float = 1.0,
                    log_fn=print) -> HeadTrainResult:
    """Portfolio head on frozen posteriors with turnover chaining
    (reference: training.py:126-163).

    batches: list of (x, u, lengths) numpy batches; returns_data[idx]
    aligns with batches (the reference indexes returns_data by batch idx,
    training.py:142).
    """
    if loss_fn is None:
        loss_fn = portfolio_loss

    # The reference steps CosineAnnealingLR per *epoch* (training.py:158-159);
    # optax schedules tick per update, so the cosine factor is applied to the
    # update directly, indexed by epoch.
    tx = optax.chain(optax.clip_by_global_norm(gradient_clip), optax.adam(lr))
    opt_state = tx.init(head_params)

    @jax.jit
    def posterior(x):
        return jax.lax.stop_gradient(vae_model.posterior(vae_params, x))

    @jax.jit
    def step(params, opt_state, q, rets, prev_w, lr_scale):
        def _loss(p):
            w = head_model(p, q)
            return loss_fn(w, rets, prev_w, q), w

        (loss, w), grads = jax.value_and_grad(_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, w

    @jax.jit
    def step_first(params, opt_state, q, rets, lr_scale):
        # reference passes prev_weights=None on the very first batch — NO
        # turnover term (training.py:133,148), not turnover-vs-zero
        def _loss(p):
            w = head_model(p, q)
            return loss_fn(w, rets, None, q), w

        (loss, w), grads = jax.value_and_grad(_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, w

    _require_full_windows(batches)
    # the frozen posterior is constant across epochs: compute it once
    # per batch, not E times (E*N encoder dispatches -> N)
    q_cache = [posterior(jnp.asarray(x)) for x, _, _ in batches]
    rets_cache = [jnp.asarray(r) for r in returns_data]

    history = []
    prev_w = None
    params = head_params
    for ep in range(num_epochs):
        # cosine epoch schedule matching torch CosineAnnealingLR(T_max=E)
        lr_scale = 0.5 * (1 + np.cos(np.pi * ep / num_epochs)) \
            if use_scheduler else 1.0
        epoch_loss = jnp.float32(0.0)  # device accumulate: one host
        #                                sync per EPOCH, not per step
        for idx in range(len(batches)):
            q, rets = q_cache[idx], rets_cache[idx]
            if prev_w is None:
                params, opt_state, loss, w = step_first(
                    params, opt_state, q, rets, jnp.float32(lr_scale))
            else:
                params, opt_state, loss, w = step(
                    params, opt_state, q, rets, prev_w,
                    jnp.float32(lr_scale))
            prev_w = jax.lax.stop_gradient(w)
            epoch_loss = epoch_loss + loss
        history.append(float(epoch_loss) / max(len(batches), 1))
        if log_fn:
            log_fn(f"Epoch {ep + 1}/{num_epochs}, "
                   f"Loss: {history[-1]:.4f}")
    return HeadTrainResult(params, history)


def train_portfolio_fused(head_model, head_params, vae_model: VAEHMM,
                          vae_params, batches, returns_data,
                          num_epochs: int = 100, lr: float = 0.001,
                          use_scheduler: bool = True,
                          loss_fn: Optional[Callable] = None,
                          gradient_clip: float = 1.0) -> HeadTrainResult:
    """train_portfolio with the whole optimization fused into ONE jitted
    lax.scan: posteriors for every batch are computed once up front, then
    all num_epochs x n_batches updates run on-device with no host
    round-trips.  Same math as train_portfolio (cosine epoch schedule,
    global-norm clip, prev-weights turnover chaining, no turnover term on
    the very first update) — tests/test_strategies.py asserts per-epoch
    loss equality against the step-wise path.

    Requires uniform batch shapes (stacked); use train_portfolio for
    ragged batch lists.  Dispatch cost drops from
    2 * E * N host->device calls to 1 + N.
    """
    if loss_fn is None:
        loss_fn = portfolio_loss
    if not batches:
        raise ValueError("train_portfolio_fused requires >= 1 batch")
    _require_full_windows(batches)

    @jax.jit
    def posterior(x):
        return jax.lax.stop_gradient(vae_model.posterior(vae_params, x))

    qs = jnp.stack([posterior(jnp.asarray(x)) for x, _, _ in batches])
    rets = jnp.stack([jnp.asarray(r) for r in returns_data])
    n_batches = qs.shape[0]
    B, A = qs.shape[1], rets.shape[-1]

    tx = optax.chain(optax.clip_by_global_norm(gradient_clip),
                     optax.adam(lr))
    # host numpy, passed as a jit ARGUMENT: computing this eagerly on
    # device and closing over it would make jit lowering embed it as a
    # constant — a device->host fetch inside tracing, which can stall
    # behind a congested dispatch tunnel
    ep_idx = np.arange(num_epochs, dtype=np.float32)
    lr_scales = (0.5 * (1 + np.cos(np.pi * ep_idx / num_epochs))
                 if use_scheduler
                 else np.ones(num_epochs)).astype(np.float32)

    def update(carry, inp):
        params, opt_state, prev_w, is_first = carry
        q, r, lr_scale = inp

        def _loss(p):
            w = head_model(p, q)
            # the reference passes prev_weights=None on the very first
            # batch (training.py:133,148): no turnover term at all
            loss = jnp.where(is_first,
                             loss_fn(w, r, None, q),
                             loss_fn(w, r, prev_w, q))
            return loss, w

        (loss, w), grads = jax.value_and_grad(_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, jax.lax.stop_gradient(w),
                jnp.zeros((), bool)), loss

    @jax.jit
    def run(params, qs, rets, lr_scales):
        opt_state = tx.init(params)

        def epoch_step(carry, lr_scale):
            # inner scan over the epoch's batches; qs/rets are closed-over
            # constants (resident once, NOT tiled per epoch)
            def batch_step(c, inp):
                q, r = inp
                return update(c, (q, r, lr_scale))

            carry, losses = jax.lax.scan(batch_step, carry, (qs, rets))
            return carry, losses.mean()

        # prev_w carry in f32: the heads emit f32 weights (psoftmax),
        # so a bf16-activation model's qs.dtype would make the scan
        # carry-in/carry-out dtypes disagree and fail the trace
        carry = (params, opt_state, jnp.zeros((B, A), jnp.float32),
                 jnp.ones((), bool))
        (params, _, _, _), epoch_losses = jax.lax.scan(
            epoch_step, carry, lr_scales)
        return params, epoch_losses

    params, epoch_losses = run(head_params, qs, rets,
                               jnp.asarray(lr_scales))
    # ONE bulk device->host transfer, not num_epochs scalar fetches
    return HeadTrainResult(params, np.asarray(epoch_losses)
                           .astype(float).tolist())


def train_portfolio_optimizer(head_model, head_params, vae_model: VAEHMM,
                              vae_params, batches, returns_data,
                              num_epochs: int = 50, lr: float = 1e-3,
                              log_fn=print) -> HeadTrainResult:
    """Simple variant: Sharpe loss, no scheduler/turnover
    (reference: VQ_VAE_HMM_fixed.py:230-250)."""
    tx = optax.adam(lr)
    opt_state = tx.init(head_params)

    @jax.jit
    def posterior(x):
        return jax.lax.stop_gradient(vae_model.posterior(vae_params, x))

    @jax.jit
    def step(params, opt_state, q, rets):
        def _loss(p):
            return sharpe_loss(head_model(p, q), rets)

        loss, grads = jax.value_and_grad(_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    _require_full_windows(batches)
    q_cache = [posterior(jnp.asarray(x)) for x, _, _ in batches]
    rets_cache = [jnp.asarray(r) for r in returns_data]

    history = []
    params = head_params
    for ep in range(num_epochs):
        epoch_loss = jnp.float32(0.0)  # one host sync per epoch
        for idx in range(len(batches)):
            params, opt_state, loss = step(params, opt_state,
                                           q_cache[idx], rets_cache[idx])
            epoch_loss = epoch_loss + loss
        history.append(float(epoch_loss) / max(len(batches), 1))
        if log_fn:
            log_fn(f"Epoch {ep + 1}/{num_epochs}, Loss: {history[-1]:.4f}")
    return HeadTrainResult(params, history)


def train_delta_hedger(hedger, hedger_params, vae_model: VAEHMM, vae_params,
                       spot_batches, futures_data, num_epochs: int = 50,
                       lr: float = 0.001, gradient_clip: float = 1.0,
                       is_lstm: bool = False,
                       log_fn=print) -> HeadTrainResult:
    """Hedger on frozen posteriors via delta_hedge_loss
    (reference: delta_hedger.py:203-235).

    spot_batches: list of (x, u, lengths); futures_data[idx]: futures
    returns aligned per batch.  spot returns are first differences of x
    along time (reference :215)."""
    tx = optax.chain(optax.clip_by_global_norm(gradient_clip),
                     optax.adam(lr))
    opt_state = tx.init(hedger_params)

    @jax.jit
    def posterior(x):
        return jax.lax.stop_gradient(vae_model.posterior(vae_params, x))

    @jax.jit
    def step(params, opt_state, q, x, fut):
        spot_ret = x[:, :, 1:] - x[:, :, :-1]
        spot_ret_t = jnp.transpose(spot_ret, (0, 2, 1))  # (B, T-1, C)

        def _loss(p):
            if is_lstm:
                h = hedger(p, q, x)
            else:
                pos = jnp.ones_like(x[:, :, -1])
                h, _ = hedger(p, q, x[:, :, -1], pos)
            return delta_hedge_loss(h, spot_ret_t, fut)

        loss, grads = jax.value_and_grad(_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    _require_full_windows(spot_batches)
    q_cache = [posterior(jnp.asarray(x)) for x, _, _ in spot_batches]
    x_cache = [jnp.asarray(x) for x, _, _ in spot_batches]
    fut_cache = [jnp.asarray(f) for f in futures_data]

    history = []
    params = hedger_params
    for ep in range(num_epochs):
        epoch_loss = jnp.float32(0.0)  # one host sync per epoch
        for idx in range(len(spot_batches)):
            params, opt_state, loss = step(
                params, opt_state, q_cache[idx], x_cache[idx],
                fut_cache[idx])
            epoch_loss = epoch_loss + loss
        history.append(float(epoch_loss) / max(len(spot_batches), 1))
        if log_fn:
            log_fn(f"Epoch {ep + 1}/{num_epochs}, "
                   f"Loss: {history[-1]:.6f}")
    return HeadTrainResult(params, history)
