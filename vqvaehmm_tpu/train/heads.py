"""Two-stage head training: frozen VAE-HMM posterior -> downstream model.

THE framework-defining dataflow (SURVEY.md section 3.2): stage-2 models
never backprop into the VAE.  Covers the reference's
* train_portfolio            (training.py:126-163) — cosine LR, clip 1.0,
  prev_weights turnover chaining across batches
* train_portfolio_optimizer  (VQ_VAE_HMM_fixed.py:230-250) — simple variant
* train_delta_hedger         (delta_hedger.py:203-235)

The frozen posterior is jax.lax.stop_gradient + a jitted encode — the
reference's torch.no_grad() equivalent without a second graph.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.portfolio import delta_hedge_loss, portfolio_loss, sharpe_loss
from ..models.vae_hmm import VAEHMM


class HeadTrainResult(NamedTuple):
    params: Dict
    history: list


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

    history = []
    prev_w = None
    params = head_params
    for ep in range(num_epochs):
        # cosine epoch schedule matching torch CosineAnnealingLR(T_max=E)
        lr_scale = 0.5 * (1 + np.cos(np.pi * ep / num_epochs)) \
            if use_scheduler else 1.0
        epoch_loss = 0.0
        for idx, (x, u, lengths) in enumerate(batches):
            q = posterior(jnp.asarray(x))
            rets = jnp.asarray(returns_data[idx])
            if prev_w is None:
                params, opt_state, loss, w = step_first(
                    params, opt_state, q, rets, jnp.float32(lr_scale))
            else:
                params, opt_state, loss, w = step(
                    params, opt_state, q, rets, prev_w,
                    jnp.float32(lr_scale))
            prev_w = jax.lax.stop_gradient(w)
            epoch_loss += float(loss)
        history.append(epoch_loss / max(len(batches), 1))
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

        carry = (params, opt_state, jnp.zeros((B, A), qs.dtype),
                 jnp.ones((), bool))
        (params, _, _, _), epoch_losses = jax.lax.scan(
            epoch_step, carry, lr_scales)
        return params, epoch_losses

    params, epoch_losses = run(head_params, qs, rets,
                               jnp.asarray(lr_scales))
    return HeadTrainResult(params, [float(v) for v in epoch_losses])


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

    history = []
    params = head_params
    for ep in range(num_epochs):
        epoch_loss = 0.0
        for idx, (x, u, lengths) in enumerate(batches):
            q = posterior(jnp.asarray(x))
            params, opt_state, loss = step(params, opt_state, q,
                                           jnp.asarray(returns_data[idx]))
            epoch_loss += float(loss)
        history.append(epoch_loss / max(len(batches), 1))
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
        fut_t = fut

        def _loss(p):
            if is_lstm:
                h = hedger(p, q, x)
            else:
                pos = jnp.ones_like(x[:, :, -1])
                h, _ = hedger(p, q, x[:, :, -1], pos)
            return delta_hedge_loss(h, spot_ret_t, fut_t)

        loss, grads = jax.value_and_grad(_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    params = hedger_params
    for ep in range(num_epochs):
        epoch_loss = 0.0
        for idx, (x, u, lengths) in enumerate(spot_batches):
            q = posterior(jnp.asarray(x))
            params, opt_state, loss = step(
                params, opt_state, q, jnp.asarray(x),
                jnp.asarray(futures_data[idx]))
            epoch_loss += float(loss)
        history.append(epoch_loss / max(len(spot_batches), 1))
        if log_fn:
            log_fn(f"Epoch {ep + 1}/{num_epochs}, "
                   f"Loss: {history[-1]:.6f}")
    return HeadTrainResult(params, history)
