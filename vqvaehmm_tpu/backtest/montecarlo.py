"""Monte Carlo portfolio simulation (reference: backtest.py:138-292).

The reference runs n_sim x n_days nested Python loops (~252k iterations)
with numpy multivariate-normal draws.  Here the whole ensemble is one
jitted program: vmap over simulations, lax.scan over days — regime
switching, per-regime multivariate draws (via Cholesky factors), periodic
rebalancing with transaction costs.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def regime_statistics(returns: np.ndarray, regimes: np.ndarray, K: int,
                      jitter: float = 1e-8
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-regime mean/cov of asset returns (reference: backtest.py:156-163).

    returns: (T, A); regimes: (T,) int labels."""
    T, A = returns.shape
    means = np.zeros((K, A))
    covs = np.tile(np.eye(A) * jitter, (K, 1, 1))
    for k in range(K):
        m = regimes == k
        if m.sum() > A + 1:
            means[k] = returns[m].mean(axis=0)
            covs[k] = np.cov(returns[m].T) + np.eye(A) * jitter
    return means, covs


def monte_carlo_simulation(weight_fn: Callable, means: np.ndarray,
                           covs: np.ndarray, key: jax.Array,
                           n_sim: int = 1000, n_days: int = 252,
                           rebalance_every: int = 5,
                           switch_prob: float = 0.05,
                           tx_cost: float = 0.001,
                           initial_value: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Simulate n_sim paths of n_days.

    weight_fn: one-hot regime (K,) -> portfolio weights (A,)  (the reference
    feeds a one-hot regime into the portfolio model at each rebalance,
    backtest.py:179-194).
    Each day: with prob switch_prob the regime resamples uniformly
    (reference :197-198); returns draw from that regime's N(mean, cov).
    """
    means = jnp.asarray(means, jnp.float32)
    K, A = means.shape
    chols = jnp.asarray(np.linalg.cholesky(np.asarray(covs)), jnp.float32)

    # Precompute weights for each possible regime (K tiny) — turns the
    # per-day model call into a gather.
    eye = jnp.eye(K, dtype=jnp.float32)
    regime_weights = jax.vmap(weight_fn)(eye)  # (K, A)

    def one_path(key):
        k0, kr = jax.random.split(key)
        z0 = jax.random.randint(k0, (), 0, K)
        w0 = regime_weights[z0]

        def day(carry, inputs):
            value, z, w, day_idx = carry
            key_t = inputs
            ks, kz, kn = jax.random.split(key_t, 3)
            # regime switching
            switch = jax.random.uniform(ks) < switch_prob
            z_new = jax.random.randint(kz, (), 0, K)
            z = jnp.where(switch, z_new, z)
            # rebalance every rebalance_every days
            rebalance = (day_idx % rebalance_every) == 0
            w_target = regime_weights[z]
            cost = jnp.where(
                rebalance, tx_cost * jnp.abs(w_target - w).sum(), 0.0)
            w = jnp.where(rebalance, w_target, w)
            # sample returns for the day
            eps = jax.random.normal(kn, (A,))
            r = means[z] + chols[z] @ eps
            day_ret = (w * r).sum() - cost
            value = value * (1.0 + day_ret)
            return (value, z, w, day_idx + 1), day_ret

        keys = jax.random.split(kr, n_days)
        (final, _, _, _), rets = lax.scan(
            day, (jnp.float32(initial_value), z0, w0, jnp.int32(0)), keys)
        return final, rets

    keys = jax.random.split(key, n_sim)
    finals, rets = jax.vmap(one_path)(keys)
    return {"final_values": finals, "daily_returns": rets}


def analyze_monte_carlo(results: Dict[str, jnp.ndarray],
                        initial_value: float = 1.0) -> Dict[str, float]:
    """Percentiles, P(profit), expected Sharpe
    (reference: backtest.py:219-249)."""
    finals = np.asarray(results["final_values"])
    rets = np.asarray(results["daily_returns"])
    total_returns = finals / initial_value - 1.0
    sharpe = (rets.mean(axis=1) / np.maximum(rets.std(axis=1, ddof=1), 1e-12)
              * np.sqrt(252))
    pct = np.percentile(total_returns, [5, 25, 50, 75, 95])
    return {
        "mean_return": float(total_returns.mean()),
        "median_return": float(pct[2]),
        "p5": float(pct[0]), "p25": float(pct[1]),
        "p75": float(pct[3]), "p95": float(pct[4]),
        "prob_profit": float((total_returns > 0).mean()),
        "expected_sharpe": float(sharpe.mean()),
        "worst_case": float(total_returns.min()),
        "best_case": float(total_returns.max()),
    }


def plot_monte_carlo(results, path: Optional[str] = None):
    """Distribution + sample-path plots (reference: backtest.py:252-292)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    finals = np.asarray(results["final_values"])
    rets = np.asarray(results["daily_returns"])
    equity = np.cumprod(1 + rets, axis=1)
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    axes[0].hist(finals, bins=50, alpha=0.7)
    axes[0].set_title("Final Value Distribution")
    axes[0].grid(True)
    for i in range(min(100, equity.shape[0])):
        axes[1].plot(equity[i], alpha=0.1, color="tab:blue")
    axes[1].plot(np.median(equity, axis=0), color="tab:red", lw=2,
                 label="median")
    axes[1].set_title("Simulated Equity Paths")
    axes[1].legend()
    axes[1].grid(True)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=100)
    return fig
