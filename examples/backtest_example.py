"""Backtesting example (reference: examples/backtest_example.py +
README.md:187-205): basic backtest, walk-forward, strategy comparison,
Monte Carlo.

Run: JAX_PLATFORMS=cpu python examples/backtest_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import vqvaehmm_tpu as vt
from vqvaehmm_tpu.backtest import (Backtester, WalkForwardBacktest,
                                   analyze_monte_carlo, compare_strategies,
                                   monte_carlo_simulation)
from vqvaehmm_tpu.data.synthetic import synthetic_sequences
from vqvaehmm_tpu.models import HeadConfig, RegimePortfolioOptimizer


def main():
    rng = np.random.default_rng(0)
    T, A = 400, 10
    prices = 100 * np.cumprod(1 + rng.normal(3e-4, 0.01, (T, A)), axis=0)
    returns = np.vstack([np.zeros((1, A)),
                         np.diff(prices, axis=0) / prices[:-1]])
    xs, us, _ = synthetic_sequences(1, T, seed=0)

    model = vt.make_model(5, 16, 3, 8, u_dim=4, trans_hidden=16)
    params = model.init(jax.random.PRNGKey(0))
    head = RegimePortfolioOptimizer(HeadConfig(K=3, n_assets=A))
    head_params = head.init(jax.random.PRNGKey(1))

    def posterior_fn(x):
        return model.posterior(params, x)

    def model_fn(q):
        return head(head_params, q)

    # basic backtest
    bt = Backtester(initial_capital=100000, tx_cost=0.001)
    result = bt.run(model_fn, posterior_fn, xs, prices, returns,
                    rebalance_freq=5)
    print(f"Sharpe Ratio: {result.metrics['sharpe_ratio']:.2f}")
    print(f"Max Drawdown: {result.metrics['max_drawdown']:.2%}")

    # walk-forward
    wf = WalkForwardBacktest(train_window=252, test_window=21,
                             retrain_freq=63)
    wf_results = wf.run(model_fn, posterior_fn, lambda d: None, xs, prices,
                        returns)
    print(f"walk-forward windows: {len(wf_results)}")

    # compare
    print(compare_strategies({"regime": result}))

    # Monte Carlo
    means = rng.normal(5e-4, 2e-4, size=(3, A))
    covs = np.stack([np.eye(A) * 1e-4] * 3)
    mc = monte_carlo_simulation(lambda onehot: head(head_params, onehot),
                                means, covs, jax.random.PRNGKey(2),
                                n_sim=200, n_days=126)
    print(analyze_monte_carlo(mc))


if __name__ == "__main__":
    main()
