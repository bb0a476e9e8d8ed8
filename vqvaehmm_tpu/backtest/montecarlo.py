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

    returns: (T, A); regimes: (T,) int labels.  A regime with too few
    samples to estimate (<= A+1) falls back to zero mean / jitter*I —
    WARNED, because days simulated in that regime contribute ~zero
    return and volatility, silently understating tail risk."""
    T, A = returns.shape
    means = np.zeros((K, A))
    covs = np.tile(np.eye(A) * jitter, (K, 1, 1))
    for k in range(K):
        m = regimes == k
        if m.sum() > A + 1:
            means[k] = returns[m].mean(axis=0)
            covs[k] = np.cov(returns[m].T) + np.eye(A) * jitter
        else:
            import warnings

            warnings.warn(
                f"regime {k} has only {int(m.sum())} samples "
                f"(need > {A + 1}); using zero-mean/jitter covariance — "
                "MC days in this regime will be ~flat", stacklevel=2)
    return means, covs


def monte_carlo_simulation(weight_fn: Callable, means: np.ndarray,
                           covs: np.ndarray, key: jax.Array,
                           n_sim: int = 1000, n_days: int = 252,
                           rebalance_every: int = 5,
                           switch_prob: float = 0.05,
                           tx_cost: float = 0.001,
                           initial_value: float = 1.0,
                           p0: Optional[np.ndarray] = None
                           ) -> Dict[str, jnp.ndarray]:
    """Simulate n_sim paths of n_days with the reference's exact loop
    semantics (backtest.py:165-215), one jitted vmap-of-scan:

    * weights start at ZERO — the day-0 rebalance pays the portfolio
      establishment cost (:172, :190-192);
    * each rebalance sets weights from the CURRENT regime, and only then
      may the regime switch (prob switch_prob, inside the rebalance
      block, :196-198) — weights lag the return-generating regime until
      the next rebalance, and switching happens per REBALANCE, not per
      day;
    * costs debit the portfolio value before the day's return compounds
      (:191-192);
    * p0: initial-regime distribution (the reference samples from the
      detector's last-day posterior, :175); None = uniform.

    weight_fn: one-hot regime (K,) -> portfolio weights (A,).
    daily_returns are value-change ratios (costs included), so
    cumprod(1 + daily_returns) reconstructs each equity path."""
    means = jnp.asarray(means, jnp.float32)
    K, A = means.shape
    chols = jnp.asarray(np.linalg.cholesky(np.asarray(covs)), jnp.float32)
    logp0 = jnp.log(jnp.asarray(
        np.full(K, 1.0 / K) if p0 is None else np.asarray(p0),
        jnp.float32))

    # Precompute weights for each possible regime (K tiny) — turns the
    # per-day model call into a gather.
    eye = jnp.eye(K, dtype=jnp.float32)
    regime_weights = jax.vmap(weight_fn)(eye)  # (K, A)

    def one_path(key):
        k0, kr = jax.random.split(key)
        z0 = jax.random.categorical(k0, logp0)
        w0 = jnp.zeros((A,), jnp.float32)

        def day(carry, key_t):
            value, z, w, day_idx = carry
            prev = value
            ks, kz, kn = jax.random.split(key_t, 3)
            rebalance = (day_idx % rebalance_every) == 0
            # rebalance to the PRE-switch regime's weights
            w_target = regime_weights[z]
            cost_frac = tx_cost * jnp.abs(w_target - w).sum()
            value = jnp.where(rebalance, value * (1.0 - cost_frac), value)
            w = jnp.where(rebalance, w_target, w)
            # regime may switch only on rebalance days, AFTER weights set
            switch = rebalance & (jax.random.uniform(ks) < switch_prob)
            z = jnp.where(switch, jax.random.randint(kz, (), 0, K), z)
            # sample returns from the (possibly new) regime
            eps = jax.random.normal(kn, (A,))
            r = means[z] + chols[z] @ eps
            value = value * (1.0 + (w * r).sum())
            return (value, z, w, day_idx + 1), value / prev - 1.0

        keys = jax.random.split(kr, n_days)
        (final, _, _, _), rets = lax.scan(
            day, (jnp.float32(initial_value), z0, w0, jnp.int32(0)), keys)
        return final, rets

    keys = jax.random.split(key, n_sim)
    finals, rets = jax.jit(jax.vmap(one_path))(keys)
    return {"final_values": finals, "daily_returns": rets,
            "initial_value": initial_value}


def analyze_monte_carlo(results: Dict[str, jnp.ndarray],
                        initial_value: Optional[float] = None
                        ) -> Dict[str, float]:
    """Percentiles, P(profit), expected Sharpe — the reference's
    cross-simulation annualized total-return Sharpe
    (backtest.py:243-247), not a mean of per-path daily Sharpes.

    initial_value defaults to the value recorded in `results` by
    monte_carlo_simulation, so the pair cannot desynchronize."""
    finals = np.asarray(results["final_values"])
    rets = np.asarray(results["daily_returns"])
    if initial_value is None:
        initial_value = float(results.get("initial_value", 1.0))
    total_returns = finals / initial_value - 1.0
    n_years = max(rets.shape[1], 1) / 252.0
    expected_sharpe = ((total_returns.mean() / n_years)
                       / (total_returns.std() / np.sqrt(n_years) + 1e-8))
    pct = np.percentile(total_returns, [5, 25, 50, 75, 95])
    return {
        "mean_return": float(total_returns.mean()),
        "median_return": float(pct[2]),
        "p5": float(pct[0]), "p25": float(pct[1]),
        "p75": float(pct[3]), "p95": float(pct[4]),
        "prob_profit": float((total_returns > 0).mean()),
        "expected_sharpe": float(expected_sharpe),
        "worst_case": float(total_returns.min()),
        "best_case": float(total_returns.max()),
    }


def plot_monte_carlo(results, path: Optional[str] = None):
    """Distribution + sample-path plots (reference: backtest.py:252-292)."""
    try:
        import sys

        import matplotlib
        if "matplotlib.pyplot" not in sys.modules:
            # don't switch an interactive session's backend from under it
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
        # saved-to-disk figures are closed (the reference does the same,
        # backtest.py:290-292) so repeated calls can't accumulate open
        # figures holding full path arrays
        plt.close(fig)
    return fig
