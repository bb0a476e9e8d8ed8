"""End-to-end walk-forward workflow (BASELINE.json config 5): rolling-window
VAE-HMM retraining + EnsemblePortfolioOptimizer + TransitionAwareHedger
through the backtester — the reference's flagship composition
(README.md:198-200, backtesting.py:121-142) with REAL retraining inside
train_fn (the unit tests elsewhere use a no-op)."""

import jax
import jax.numpy as jnp
import numpy as np

import vqvaehmm_tpu as vt
from vqvaehmm_tpu.backtest import Backtester, WalkForwardBacktest
from vqvaehmm_tpu.data.synthetic import synthetic_sequences
from vqvaehmm_tpu.models import (EnsemblePortfolioOptimizer, HeadConfig,
                                 TransitionAwareHedger)


def test_walkforward_with_real_retraining():
    T, A = 260, 6
    rng = np.random.default_rng(0)
    xs, us, _ = synthetic_sequences(1, T, 5, 4, 3, seed=0)
    prices = 100 * np.cumprod(1 + rng.normal(3e-4, 0.01, (T, A)), axis=0)
    returns = np.vstack([np.zeros((1, A)),
                         np.diff(prices, axis=0) / prices[:-1]])

    model = vt.make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    head = EnsemblePortfolioOptimizer(HeadConfig(K=3, n_assets=A,
                                                 hidden_dim=8), n_models=3)
    head_params = head.init(jax.random.PRNGKey(1))

    state_box = {"state": None}
    retrain_count = {"n": 0}

    def train_fn(train_data):
        """Retrain the VAE on the window's chunks (reference train_fn role,
        backtesting.py:132) and return refreshed closures."""
        retrain_count["n"] += 1
        win_T = train_data.shape[2]
        ds = vt.RandomChunkDataset([train_data[0]], [us[0, :, :win_T]],
                                   min_len=16, max_len=min(48, win_T),
                                   samples_per_epoch=16, seed=0)
        state, _ = vt.train_model(model, ds, num_epochs=1, lr=1e-3,
                                  batch_size=8, log_fn=None,
                                  state=state_box["state"])
        state_box["state"] = state

        def posterior_fn(x):
            return model.posterior(state.params, x)

        def model_fn(q):
            return head(head_params, q)

        return model_fn, posterior_fn

    wf = WalkForwardBacktest(train_window=120, test_window=21,
                             retrain_freq=60,
                             backtester=Backtester(initial_capital=1e5))
    results = wf.run(None, None, train_fn, xs, prices, returns)

    assert retrain_count["n"] == len(results) >= 2
    for res in results:
        assert len(res.equity_curve) == 21
        assert np.isfinite(res.metrics["sharpe_ratio"])
        assert res.equity_curve[-1] > 0

    # hedging on the final trained posterior (BASELINE config 4 pattern)
    state = state_box["state"]
    q = model.posterior(state.params, jnp.asarray(xs[:, :, -40:]))
    _, log_A = model.prior(state.params, jnp.asarray(us[:, :, -40:]))
    hedger = TransitionAwareHedger(HeadConfig(K=3, n_assets=A,
                                              hidden_dim=8), lookahead=5)
    hp = hedger.init(jax.random.PRNGKey(2))
    spot = jnp.asarray(prices[-1:, :A].astype(np.float32))
    hedge = hedger(hp, q, jnp.exp(log_A), spot)
    assert hedge.shape == (1, A)
    assert np.all(np.abs(np.asarray(hedge)) <= 1.0)
