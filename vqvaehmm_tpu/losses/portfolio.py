"""Portfolio and hedging loss functions — the full set from the reference's
loss_functions.py, VQ_VAE_HMM_fixed.py:198-228 and delta_hedger.py:186-200,
as pure jittable functions.

Semantics notes:
* Shapes follow the reference: weights (B, n_assets), returns
  (B, T, n_assets), regime probs (B, K) or (B, K, T).
* Standard deviations use ddof=1 (torch's unbiased default) so values match
  the reference exactly.
* Per-regime Python loops in the reference (loss_functions.py:94-107,
  delta_hedger.py:101-110) are replaced by vectorized einsums / vmap — the
  TPU-native shape of the same math.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precise import psoftmax


def _std(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Unbiased (ddof=1) std, matching torch.Tensor.std."""
    return jnp.std(x, axis=axis, ddof=1)


def _portfolio_returns(weights: jnp.ndarray,
                       returns: jnp.ndarray) -> jnp.ndarray:
    """(B,A),(B,T,A) -> (B,T) per-step portfolio returns."""
    return (weights[:, None, :] * returns).sum(-1)


def sharpe_loss(weights, returns, rf: float = 0.0) -> jnp.ndarray:
    """-mean Sharpe (reference: VQ_VAE_HMM_fixed.py:198-202)."""
    pr = _portfolio_returns(weights, returns)
    mu = pr.mean(axis=1)
    sigma = jnp.maximum(_std(pr, 1), 1e-8)
    return -((mu - rf) / sigma).mean()


def sortino_loss(weights, returns, risk_free_rate: float = 0.0,
                 target_return: float = 0.0) -> jnp.ndarray:
    """Downside-deviation Sharpe (reference: loss_functions.py:50-56)."""
    pr = _portfolio_returns(weights, returns)
    mu = pr.mean(axis=1)
    downside = jnp.minimum(pr - target_return, 0.0)
    dstd = jnp.maximum(jnp.sqrt((downside ** 2).mean(axis=1)), 1e-8)
    return -((mu - risk_free_rate) / dstd).mean()


def _max_drawdown(pr: jnp.ndarray) -> jnp.ndarray:
    """(B,T) returns -> (B,) max drawdown of the cumulative-sum curve
    (reference: loss_functions.py:32-35)."""
    cum = jnp.cumsum(pr, axis=1)
    running_max = lax.cummax(cum, axis=1)
    return (running_max - cum).max(axis=1)


def calmar_loss(weights, returns) -> jnp.ndarray:
    """-mean(mu / maxDD)  (reference: loss_functions.py:59-67)."""
    pr = _portfolio_returns(weights, returns)
    mu = pr.mean(axis=1)
    mdd = jnp.maximum(_max_drawdown(pr), 1e-8)
    return -(mu / mdd).mean()


def portfolio_loss(weights, returns, prev_weights=None, regime_probs=None,
                   covariance=None, risk_free_rate: float = 0.0,
                   transaction_cost: float = 0.001, max_weight: float = 0.3,
                   max_leverage: float = 1.0, lambda_turnover: float = 0.1,
                   lambda_drawdown: float = 0.1,
                   lambda_cvar: float = 0.1) -> jnp.ndarray:
    """Multi-objective loss: -Sharpe + turnover + position/leverage
    penalties + maxDD + CVaR@5% (reference: loss_functions.py:6-47).

    regime_probs and covariance are accepted but UNUSED — the reference
    declares and ignores them too (loss_functions.py:6-9), and callers
    (train/heads.py) pass q through for signature parity."""
    T = returns.shape[1]
    pr = _portfolio_returns(weights, returns)

    mu = pr.mean(axis=1)
    sigma = jnp.maximum(_std(pr, 1), 1e-8)
    sharpe = (mu - risk_free_rate) / sigma

    turnover_loss = 0.0
    if prev_weights is not None:
        turnover = jnp.abs(weights - prev_weights).sum(-1)
        turnover_loss = transaction_cost * turnover.mean()

    position_penalty = jax.nn.relu(weights - max_weight).sum(-1).mean()
    leverage_penalty = jax.nn.relu(weights.sum(-1) - max_leverage).mean()
    max_dd = _max_drawdown(pr).mean()

    # CVaR at 5%: mean of the worst alpha*T sorted returns
    alpha = 0.05
    var_idx = int(alpha * T)
    sorted_r = jnp.sort(pr, axis=1)
    cvar = -sorted_r[:, :var_idx].mean() if var_idx > 0 else jnp.float32(0.0)

    return (-sharpe.mean() + lambda_turnover * turnover_loss
            + position_penalty + leverage_penalty
            + lambda_drawdown * max_dd + lambda_cvar * cvar)


def risk_parity_loss(weights, returns, covariance=None) -> jnp.ndarray:
    """Squared deviation of risk contributions from equal
    (reference: loss_functions.py:70-86)."""
    if covariance is None:
        B, T, n_assets = returns.shape
        centered = returns - returns.mean(axis=1, keepdims=True)
        covariance = jnp.einsum("bta,btc->bac", centered, centered) / T
    port_var = jnp.einsum("ba,bac,bc->b", weights, covariance, weights)
    port_std = jnp.sqrt(jnp.maximum(port_var, 1e-8))
    marginal = jnp.einsum("bac,bc->ba", covariance, weights)
    contrib = weights * marginal / port_std[:, None]
    target = contrib.mean(-1, keepdims=True)
    return ((contrib - target) ** 2).sum(-1).mean()


def regime_conditional_loss(weights, returns, regime_probs,
                            K: int) -> jnp.ndarray:
    """Per-regime prob-weighted Sharpe, weighted by final-step regime prob
    (reference: loss_functions.py:89-109, Python loop over K vectorized)."""
    from ..ops.nn import as_seq

    B, T, n_assets = returns.shape
    rp = as_seq(regime_probs, K)  # (B,T,K), reference sniff rule

    w_ret = returns[:, :, None, :] * rp[:, :, :, None]  # (B,T,K,A)
    centered = w_ret - w_ret.mean(axis=1, keepdims=True)
    cov = jnp.einsum("btka,btkc->bkac", centered, centered) / T
    port_var = jnp.einsum("ba,bkac,bc->bk", weights, cov, weights)
    pr = jnp.einsum("ba,btka->btk", weights, w_ret)
    mu = pr.mean(axis=1)  # (B,K)
    sharpe_k = mu / jnp.sqrt(jnp.maximum(port_var, 1e-8))
    weight_k = rp[:, -1, :].mean(axis=0)  # (K,)
    return -(sharpe_k.mean(axis=0) * weight_k).sum()


def adversarial_portfolio_loss(model_fn: Callable, regime_probs, returns,
                               epsilon: float = 0.01) -> jnp.ndarray:
    """FGSM on regime probabilities (reference: loss_functions.py:112-125).

    model_fn: regime_probs -> weights (closure over params).  JAX grads are
    differentiable by construction, so the create_graph=True semantics come
    for free.
    """
    def inner(rp):
        w = model_fn(rp)
        return -_portfolio_returns(w, returns).mean()

    grad = jax.grad(inner)(regime_probs)
    perturbed = regime_probs + epsilon * jnp.sign(grad)
    perturbed = psoftmax(perturbed, axis=1)
    w_adv = model_fn(perturbed)
    return -_portfolio_returns(w_adv, returns).mean()


def transition_aware_loss(weights, returns, regime_probs, transition_probs,
                          rebalance_cost: float = 0.001,
                          lookahead: int = 5) -> jnp.ndarray:
    """Sharpe penalized by Chapman-Kolmogorov regime-change probability
    (reference: loss_functions.py:128-147).

    regime_probs is (B, K, T) — the reference's declared layout
    (loss_functions.py:129) — or (B, T, K), disambiguated against
    returns' T; transition_probs is the per-timestep (B, T, K, K)
    stack (the last matrix drives the lookahead, as in the
    reference)."""
    T = returns.shape[1]
    if regime_probs.ndim == 3 and regime_probs.shape[2] != T \
            and regime_probs.shape[1] == T:
        regime_probs = jnp.transpose(regime_probs, (0, 2, 1))
    current = regime_probs[:, :, -1]  # (B,K)
    A_last = transition_probs[:, -1, :, :]  # (B,K,K)

    def roll(p, _):
        return jnp.einsum("bk,bkj->bj", p, A_last), None

    future, _ = lax.scan(roll, current, None, length=lookahead)
    change_prob = 1.0 - (current * future).sum(-1)

    pr = _portfolio_returns(weights, returns)
    mu = pr.mean(axis=1)
    sigma = jnp.maximum(_std(pr, 1), 1e-8)
    sharpe = mu / sigma
    return -(sharpe - rebalance_cost * change_prob).mean()


def regime_aware_sharpe_loss(weights, returns, regime_probs, trans_probs,
                             rf: float = 0.0) -> jnp.ndarray:
    """Confidence-weighted Sharpe minus short-duration penalty
    (reference: VQ_VAE_HMM_fixed.py:214-228).

    regime_probs is the per-timestep posterior path, (B, T, K) (or (B, K, T)
    — detected by matching T against returns); confidence weights each
    step's portfolio return.
    """
    pr = _portfolio_returns(weights, returns)
    T = returns.shape[1]
    if regime_probs.ndim == 3 and regime_probs.shape[1] != T \
            and regime_probs.shape[2] == T:
        regime_probs = jnp.transpose(regime_probs, (0, 2, 1))
    confidence = regime_probs.max(axis=-1)
    weighted = pr * confidence
    if trans_probs.ndim == 4:
        # a per-timestep (B,T,K,K) stack: the reference uses the LAST
        # step's transition matrix (VQ_VAE_HMM_fixed.py:214-228), not a
        # time-average of diagonals
        trans_probs = trans_probs[:, -1]
    diag = jnp.diagonal(trans_probs, axis1=-2, axis2=-1).mean(-1)
    duration = 1.0 / (1.0 - diag + 1e-8)
    penalty = 0.01 / jnp.maximum(duration, 1.0)
    mu = weighted.mean(axis=1)
    sigma = jnp.maximum(_std(weighted, 1), 1e-8)
    sharpe = (mu - rf) / sigma
    return -(sharpe.mean() - penalty.mean())


# ---------------------------------------------------------------------------
# Hedging losses / analytics (reference: delta_hedger.py:95-200)
# ---------------------------------------------------------------------------


def delta_hedge_loss(hedge_pos, spot_ret, futures_ret, tx_costs=None,
                     lambda_cost: float = 0.1) -> jnp.ndarray:
    """var(spot + h*futures) + cost penalty (reference :186-194)."""
    hedged = spot_ret + hedge_pos[:, None, :] * futures_ret
    hedge_var = jnp.var(hedged, axis=1, ddof=1).mean()
    cost = tx_costs.mean() if tx_costs is not None else 0.0
    return hedge_var + lambda_cost * cost


def minimum_variance_hedge_ratio(spot_ret, futures_ret, regime_probs=None,
                                 K: Optional[int] = None) -> jnp.ndarray:
    """Regime-conditional min-variance hedge ratio (reference :95-117);
    the per-K loop becomes an einsum."""
    if regime_probs is not None and K is not None:
        from ..ops.nn import as_seq

        rp = as_seq(regime_probs, K)  # (B,T,K), reference sniff rule
        wsum = jnp.maximum(rp.sum(axis=1), 1e-8)  # (B,K)
        spot_w = spot_ret[:, :, None, :] * rp[:, :, :, None]  # (B,T,K,A)
        fut_w = futures_ret[:, :, None, :] * rp[:, :, :, None]
        cov = (spot_w * fut_w).sum(axis=1) / wsum[:, :, None]
        var = (fut_w ** 2).sum(axis=1) / wsum[:, :, None]
        ratios = cov / jnp.maximum(var, 1e-8)  # (B,K,A)
        return (ratios * rp[:, -1, :, None]).sum(axis=1)
    cov = (spot_ret * futures_ret).mean(axis=1)
    var = jnp.maximum((futures_ret ** 2).mean(axis=1), 1e-8)
    return cov / var


def optimal_hedge_frequency(spot_vol, tx_cost, regime_persistence):
    """Leland (1985) rehedging frequency scaled by regime persistence
    (reference :197-200)."""
    base = jnp.sqrt(8.0 * tx_cost
                    / (jnp.pi * jnp.maximum(spot_vol ** 2, 1e-12)))
    return base / jnp.maximum(regime_persistence, 1.0)
