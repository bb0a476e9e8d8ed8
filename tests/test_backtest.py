"""Backtesting engine vs a literal numpy re-implementation of the
reference loop semantics (backtesting.py:26-77), plus walk-forward,
regime split, Monte Carlo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.backtest import (Backtester, RegimeBacktest,
                                   WalkForwardBacktest,
                                   analyze_monte_carlo, compare_strategies,
                                   monte_carlo_simulation,
                                   regime_statistics)


def _fixture(T=120, A=3, seed=0):
    rng = np.random.default_rng(seed)
    prices = 100 * np.cumprod(1 + rng.normal(2e-4, 0.01, size=(T, A)),
                              axis=0)
    returns = np.diff(prices, axis=0) / prices[:-1]
    data = rng.normal(size=(1, 5, T)).astype(np.float32)
    return data, prices, np.vstack([np.zeros((1, A)), returns])


def fake_posterior(x):
    """Deterministic pseudo-posterior from data (stands in for the VAE)."""
    logits = jnp.stack([x[:, 0, :], x[:, 1, :], x[:, 2, :]], axis=1)
    return jax.nn.softmax(logits, axis=1)


def fake_model(q):
    """Weights from mean posterior — deterministic head."""
    qm = q.mean(axis=-1) if q.ndim == 3 else q
    w = jax.nn.softmax(qm, axis=-1)
    # expand to 3 assets
    return w


def test_backtester_matches_reference_loop():
    data, prices, returns = _fixture()
    bt = Backtester(initial_capital=100000, tx_cost=0.001, slippage=0.0005,
                    accounting="reference")
    res = bt.run(fake_model, fake_posterior, data, prices, returns,
                 rebalance_freq=5)

    # literal reference loop in numpy
    n, A = prices.shape
    positions = np.zeros((n, A))
    trades = np.zeros((n, A))
    values = np.zeros(n)
    values[0] = 100000.0
    for t in range(1, n):
        if t % 5 == 0 and t > 20:
            win = data[:, :, max(0, t - 20):t]
            q = np.asarray(fake_posterior(jnp.asarray(win)))
            w = np.asarray(fake_model(jnp.asarray(q))).flatten()
            if w.sum() > 1.0:
                w = w / w.sum() * 1.0
            target = w * values[t - 1] / prices[t]
            trades[t] = target - positions[t - 1]
            positions[t] = target
        else:
            positions[t] = positions[t - 1]
        tv = np.abs(trades[t] * prices[t]).sum()
        costs = tv * 0.0015
        pv = (positions[t] * prices[t]).sum()
        cash = values[t - 1] - (positions[t - 1] * prices[t - 1]).sum()
        values[t] = pv + cash - costs

    np.testing.assert_allclose(res.equity_curve, values, rtol=1e-6)
    assert set(res.metrics) >= {"total_return", "annual_return",
                                "sharpe_ratio", "sortino_ratio",
                                "max_drawdown", "calmar_ratio", "win_rate",
                                "final_value"}


def test_walk_forward():
    data, prices, returns = _fixture(T=400)
    calls = []

    def train_fn(train_data):
        calls.append(train_data.shape)
        return None  # keep same model

    wf = WalkForwardBacktest(train_window=252, test_window=21,
                             retrain_freq=50)
    results = wf.run(fake_model, fake_posterior, train_fn, data, prices,
                     returns)
    assert len(results) == len(calls) > 0
    for r in results:
        assert len(r.equity_curve) == 21


def test_regime_backtest():
    data, prices, returns = _fixture(T=200)
    rb = RegimeBacktest()
    results = rb.run(fake_model, fake_posterior, data, prices, returns,
                     K=3, min_samples=10)
    assert len(results) >= 1
    total = sum(len(r.equity_curve) for r in results.values())
    assert total <= 200


def test_compare_strategies():
    data, prices, returns = _fixture()
    bt = Backtester()
    r1 = bt.run(fake_model, fake_posterior, data, prices, returns, 5)
    df = compare_strategies({"a": r1, "b": r1})
    assert df.shape[0] == 2
    assert "sharpe_ratio" in df.columns


def test_monte_carlo():
    rng = np.random.default_rng(0)
    K, A = 3, 4
    means = rng.normal(5e-4, 2e-4, size=(K, A))
    covs = np.stack([np.eye(A) * 1e-4 for _ in range(K)])

    def weight_fn(onehot):
        return jnp.full((A,), 1.0 / A)

    results = monte_carlo_simulation(weight_fn, means, covs,
                                     jax.random.PRNGKey(0), n_sim=64,
                                     n_days=60)
    assert results["final_values"].shape == (64,)
    assert results["daily_returns"].shape == (64, 60)
    stats = analyze_monte_carlo(results)
    assert stats["p5"] <= stats["median_return"] <= stats["p95"]
    assert 0.0 <= stats["prob_profit"] <= 1.0
    assert np.isfinite(stats["expected_sharpe"])


def test_regime_statistics():
    rng = np.random.default_rng(1)
    T, A, K = 300, 4, 3
    regimes = rng.integers(0, K, T)
    rets = rng.normal(size=(T, A)) * (1 + regimes[:, None])
    means, covs = regime_statistics(rets, regimes, K)
    assert means.shape == (K, A) and covs.shape == (K, A, A)
    # higher-regime rows have larger variance
    assert np.trace(covs[2]) > np.trace(covs[0])


def test_trade_log_and_cost_metrics():
    data, prices, returns = _fixture()
    bt = Backtester()
    res = bt.run(fake_model, fake_posterior, data, prices, returns,
                 rebalance_freq=10)
    assert "num_trades" in res.metrics and "cost_ratio" in res.metrics
    assert res.metrics["cost_ratio"] >= 0
    assert res.trade_log is not None
    for entry in res.trade_log:
        assert set(entry) == {"t", "trade_value", "cost", "weights"}


def test_regime_backtest_viterbi_decode():
    """decode='viterbi' routes through the model's exact MAP decode and
    splits periods by the decoded regime (upgrade over reference
    backtesting.py:155 argmax)."""
    from vqvaehmm_tpu import make_model

    data, prices, returns = _fixture(T=200)
    u = np.random.default_rng(3).normal(size=(1, 4, 200)).astype(np.float32)
    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))

    def decode_fn(x, uu):
        return model.viterbi_decode(params, x, uu)

    rb = RegimeBacktest()
    results = rb.run(fake_model, fake_posterior, data, prices, returns,
                     K=3, min_samples=5, decode="viterbi",
                     decode_fn=decode_fn, u=u)
    # the split must tile a subset of the timeline with valid state labels
    states = np.asarray(decode_fn(jnp.asarray(data), jnp.asarray(u)))
    assert states.shape == (1, 200) and states.min() >= 0 and states.max() < 3
    total = sum(len(r.equity_curve) for r in results.values())
    assert 0 < total <= 200

    with pytest.raises(ValueError):
        rb.run(fake_model, fake_posterior, data, prices, returns,
               K=3, decode="viterbi")  # missing decode_fn/u
    with pytest.raises(ValueError):
        rb.run(fake_model, fake_posterior, data, prices, returns,
               K=3, decode="bogus")


def test_cash_accounting_is_self_financing():
    """Default accounting: with zero costs, the portfolio value changes
    ONLY through market P&L — buying shares moves money from cash to
    positions, never creates it.  (The reference's accounting roughly
    DOUBLES the portfolio at the first rebalance — backtesting.py:59-62
    never debits the purchase; that behavior survives only under
    accounting="reference".)"""
    data, prices, returns = _fixture()
    bt = Backtester(initial_capital=100000, tx_cost=0.0, slippage=0.0)
    res = bt.run(fake_model, fake_posterior, data, prices, returns,
                 rebalance_freq=5)

    # until the first rebalance (t=25) the value must be flat at capital
    np.testing.assert_allclose(res.equity_curve[:25], 100000.0)
    # at the first rebalance value is unchanged (cash -> positions swap)
    assert abs(res.equity_curve[25] - 100000.0) < 1e-6
    # every subsequent step moves only by position P&L
    for t in range(26, len(prices)):
        pnl = (res.positions[t - 1] * (prices[t] - prices[t - 1])).sum()
        if not res.trades[t].any():
            np.testing.assert_allclose(
                res.equity_curve[t] - res.equity_curve[t - 1], pnl,
                rtol=1e-8, atol=1e-6)

    # the reference mode reproduces the first-rebalance doubling
    bt_ref = Backtester(initial_capital=100000, tx_cost=0.0, slippage=0.0,
                        accounting="reference")
    ref = bt_ref.run(fake_model, fake_posterior, data, prices, returns,
                     rebalance_freq=5)
    w_invested = min(1.0, float(np.asarray(
        fake_model(fake_posterior(jnp.asarray(data[:, :, 5:25])))).sum()))
    assert ref.equity_curve[25] > 100000.0 * (1.0 + 0.9 * w_invested)


def test_plot_results_and_plot_monte_carlo(tmp_path, rng):
    """Plot builders (reference backtesting.py:184-211, backtest.py:253-290)
    run headless and write the artifact files."""
    import matplotlib

    matplotlib.use("Agg")
    from vqvaehmm_tpu.backtest import (BacktestResult, plot_monte_carlo,
                                       plot_results)

    rets = rng.normal(5e-4, 0.01, size=200).astype(np.float32)
    equity = 1e5 * np.cumprod(1 + rets)
    dd = equity / np.maximum.accumulate(equity) - 1
    result = BacktestResult(
        returns=rets, positions=rng.dirichlet(np.ones(3), size=200),
        trades=np.zeros(200), metrics={"sharpe_ratio": 1.0},
        equity_curve=equity, drawdowns=dd)
    fig = plot_results(result, title="t")
    assert fig is not None
    fig.savefig(str(tmp_path / "bt.png"))
    assert (tmp_path / "bt.png").exists()

    mc = {"final_values": 1 + rng.normal(0, 0.1, size=50),
          "daily_returns": rng.normal(0, 0.01, size=(50, 60))}
    plot_monte_carlo(mc, str(tmp_path / "mc.png"))
    assert (tmp_path / "mc.png").exists()


def test_walkforward_warmup_actually_trades():
    """warmup=True (default) feeds each test window the train tail as
    posterior context, so trading starts at t=1 — the reference's
    walk-forward never trades at the default test_window=21 (its test
    slices carry no context and the backtester needs 20 steps before
    the first trade)."""
    data, prices, returns = _fixture(T=400)

    wf = WalkForwardBacktest(train_window=252, test_window=21,
                             retrain_freq=50)
    results = wf.run(fake_model, fake_posterior, lambda d: None, data,
                     prices, returns)
    assert len(results) > 0
    for r in results:
        assert np.abs(r.positions).sum() > 0, "window traded nothing"
        assert len(r.equity_curve) == 21

    # reference parity mode: the dead zone is preserved on request
    wf_ref = WalkForwardBacktest(train_window=252, test_window=21,
                                 retrain_freq=50, warmup=False)
    for r in wf_ref.run(fake_model, fake_posterior, lambda d: None, data,
                        prices, returns):
        assert np.abs(r.positions).sum() == 0


def test_walkforward_includes_last_complete_window():
    """Exactly one full train+test window must yield one result (the
    reference's range bound dropped it)."""
    data, prices, returns = _fixture(T=273)
    wf = WalkForwardBacktest(train_window=252, test_window=21,
                             retrain_freq=21)
    results = wf.run(fake_model, fake_posterior, lambda d: None, data,
                     prices, returns)
    assert len(results) == 1


def test_sortino_guard_single_loss():
    """One losing step -> downside std 0; sortino must stay finite."""
    bt = Backtester(tx_cost=0.0, slippage=0.0)
    # flat prices except one dip: exactly one negative portfolio return
    prices = np.full((30, 3), 100.0)
    prices[15:] = 99.0
    data = np.zeros((1, 5, 30), np.float32)
    res = bt.run(fake_model, fake_posterior, data, prices,
                 np.zeros((30, 3)))
    assert np.isfinite(res.metrics["sortino_ratio"])


def test_gross_leverage_clamp_cash_mode():
    """cash mode bounds GROSS |w| exposure; reference mode keeps the
    net-sum rule (long-short vectors evade it) for parity."""
    def ls_model(q):
        B = q.shape[0]
        return jnp.tile(jnp.asarray([[1.5, -1.0, 0.0]]), (B, 1))

    data, prices, returns = _fixture(T=80)

    # rebalance every step: gross exposure is set from the PREVIOUS
    # equity at each t, so the clamp is checkable step by step
    res = Backtester(tx_cost=0.0, slippage=0.0).run(
        ls_model, fake_posterior, data, prices, returns,
        rebalance_freq=1)
    gross = np.abs(res.positions * prices).sum(-1)
    equity = res.equity_curve
    traded = gross > 0
    assert traded.any()
    idx = np.nonzero(traded)[0]
    np.testing.assert_array_less(gross[idx],
                                 equity[idx - 1] * 1.0 + 1e-6)

    # reference mode: the same vector's NET sum is 0.5, so it passes the
    # net-sum rule unclamped at 2.5x gross (pinned as the parity target)
    res_ref = Backtester(tx_cost=0.0, slippage=0.0,
                         accounting="reference").run(
        ls_model, fake_posterior, data, prices, returns,
        rebalance_freq=1)
    gross_ref = np.abs(res_ref.positions * prices).sum(-1)
    idx_r = np.nonzero(gross_ref > 0)[0]
    assert (gross_ref[idx_r] > res_ref.equity_curve[idx_r - 1]).any()


def test_monte_carlo_reference_semantics():
    """Pins the reference MC loop semantics (backtest.py:165-215):
    day-0 pays the establishment cost from zero weights, and the regime
    can switch only on rebalance days (weights lag the new regime)."""
    K = A = 3
    means = np.array([[1e-3] * A, [2e-3] * A, [3e-3] * A], np.float32)
    covs = np.stack([np.eye(A, dtype=np.float32) * 1e-12] * K)

    def weight_fn(onehot):
        return onehot  # regime k holds asset k

    # (a) establishment cost: no switching, huge rebalance interval ->
    # exactly one rebalance (day 0) from w=0, cost = tx * |w|.sum() = tx
    mc = monte_carlo_simulation(weight_fn, means, covs,
                                jax.random.PRNGKey(0), n_sim=4,
                                n_days=3, rebalance_every=10,
                                switch_prob=0.0, tx_cost=0.01)
    rets = np.asarray(mc["daily_returns"])
    # day 0 return ratio = (1 - 0.01) * (1 + mean) - 1 ~= mean - 0.01
    assert (rets[:, 0] < -0.005).all(), rets[:, 0]
    assert (rets[:, 1:] > 0).all()  # no further costs

    # (b) switch cadence: switch_prob=1 -> the regime changes at every
    # REBALANCE, never between them; with near-zero cov the daily return
    # is constant within each rebalance block
    mc = monte_carlo_simulation(weight_fn, means, covs,
                                jax.random.PRNGKey(1), n_sim=8,
                                n_days=20, rebalance_every=5,
                                switch_prob=1.0, tx_cost=0.0)
    rets = np.asarray(mc["daily_returns"])
    for blk in range(4):
        block = rets[:, blk * 5:(blk + 1) * 5]
        # atol 1e-4: regime means differ by 1e-3; the 1e-12*I cov
        # jitter adds ~3e-6 of within-block noise
        np.testing.assert_allclose(
            block, np.broadcast_to(block[:, :1], block.shape), atol=1e-4,
                                   err_msg=f"block {blk} not constant "
                                           "(regime switched mid-block)")

    # analyze reads initial_value from the results dict
    stats = analyze_monte_carlo(mc)
    assert np.isfinite(stats["expected_sharpe"])

    # p0: a delta initial distribution pins every path's first block
    mc = monte_carlo_simulation(weight_fn, means, covs,
                                jax.random.PRNGKey(2), n_sim=8,
                                n_days=4, rebalance_every=10,
                                switch_prob=0.0, tx_cost=0.0,
                                p0=np.array([0.0, 0.0, 1.0]))
    rets = np.asarray(mc["daily_returns"])
    np.testing.assert_allclose(rets, 3e-3, atol=1e-5)
