"""Training strategies: MAML meta-learning, online EMA, walk-forward, and
the two-stage frozen-posterior head trainers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.data.synthetic import synthetic_returns, synthetic_sequences
from vqvaehmm_tpu.losses import sharpe_loss
from vqvaehmm_tpu.models import HeadConfig, RegimePortfolioOptimizer
from vqvaehmm_tpu.train import (MetaPortfolioOptimizer,
                                OnlinePortfolioOptimizer, WalkForwardTrainer,
                                train_delta_hedger, train_portfolio,
                                train_portfolio_optimizer)

CFG = HeadConfig(K=3, n_assets=4, hidden_dim=8)


def _head():
    m = RegimePortfolioOptimizer(CFG)
    return m, m.init(jax.random.PRNGKey(0))


def _task(rng, B=8, T=10):
    q = rng.dirichlet(np.ones(3), size=B).astype(np.float32)
    r = rng.normal(1e-3, 0.01, size=(B, T, 4)).astype(np.float32)
    return q, r


def test_meta_optimizer_adapts(rng):
    model, params = _head()
    meta = MetaPortfolioOptimizer(model, params, inner_lr=0.05,
                                  outer_lr=0.01, n_inner=3)
    support = _task(rng)
    adapted = meta.adapt(support, sharpe_loss)
    # adapted params differ from originals
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(adapted),
        jax.tree_util.tree_leaves(meta.params))]
    assert max(diffs) > 0

    tasks = [(_task(rng, 8), _task(rng, 8)) for _ in range(2)]
    l0 = meta.meta_update(tasks, sharpe_loss)
    for _ in range(5):
        l1 = meta.meta_update(tasks, sharpe_loss)
    assert np.isfinite(l1)
    assert l1 <= l0 + 0.5  # improving or at least not exploding


def test_online_optimizer_ema(rng):
    model, params = _head()
    opt = OnlinePortfolioOptimizer(model, params, lr=0.01, ema_decay=0.5)
    q, r = _task(rng)
    losses = [opt.update(q, r) for _ in range(10)]
    assert all(np.isfinite(l) for l in losses)
    # EMA differs from live params until use_ema() swaps them in
    d = [float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(opt.params),
        jax.tree_util.tree_leaves(opt.ema_params))]
    assert max(d) > 0
    opt.use_ema()
    d = [float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(opt.params),
        jax.tree_util.tree_leaves(opt.ema_params))]
    assert max(d) == 0


def test_walk_forward_trainer(rng):
    model, params = _head()
    n = 400
    q = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    r = rng.normal(1e-3, 0.01, size=(n, 5, 4)).astype(np.float32)
    wf = WalkForwardTrainer(model, params, sharpe_loss, train_window=100,
                            test_window=20, retrain_freq=50, lr=0.01)
    results = wf.run((q, r), n_periods=3)
    assert len(results) == 3
    for res in results:
        assert np.isfinite(res["train_loss"])
        assert np.isfinite(res["test_sharpe"])


@pytest.fixture
def frozen_vae():
    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(1))
    return model, params


def _batches(rng, n_batches=2, B=8, T=24):
    out = []
    for _ in range(n_batches):
        x = rng.normal(size=(B, 5, T)).astype(np.float32)
        u = rng.normal(size=(B, 4, T)).astype(np.float32)
        lengths = np.full(B, T, np.int32)
        out.append((x, u, lengths))
    return out


def test_train_portfolio_full(frozen_vae, rng):
    vae, vae_params = frozen_vae
    head, head_params = _head()
    batches = _batches(rng)
    rets = synthetic_returns(2, 8, horizon=20, n_assets=4, seed=0)
    res = train_portfolio(head, head_params, vae, vae_params, batches, rets,
                          num_epochs=3, lr=0.01, log_fn=None)
    assert len(res.history) == 3
    assert all(np.isfinite(h) for h in res.history)
    # frozen VAE: vae params must be untouched (pure functions, trivially
    # true, but the head must have moved)
    moved = [float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(res.params),
        jax.tree_util.tree_leaves(head_params))]
    assert max(moved) > 0


def test_train_portfolio_optimizer_simple(frozen_vae, rng):
    vae, vae_params = frozen_vae
    head, head_params = _head()
    batches = _batches(rng)
    rets = synthetic_returns(2, 8, horizon=20, n_assets=4, seed=1)
    res = train_portfolio_optimizer(head, head_params, vae, vae_params,
                                    batches, rets, num_epochs=3, lr=0.01,
                                    log_fn=None)
    assert len(res.history) == 3


def test_train_delta_hedger(frozen_vae, rng):
    from vqvaehmm_tpu.models import RegimeDeltaHedger

    vae, vae_params = frozen_vae
    cfg = HeadConfig(K=3, n_assets=5, hidden_dim=8)
    hedger = RegimeDeltaHedger(cfg)
    hp = hedger.init(jax.random.PRNGKey(2))
    batches = _batches(rng, B=4, T=16)
    futures = [rng.normal(0, 0.01, size=(4, 15, 5)).astype(np.float32)
               for _ in range(2)]
    res = train_delta_hedger(hedger, hp, vae, vae_params, batches, futures,
                             num_epochs=3, lr=0.01, log_fn=None)
    assert len(res.history) == 3
    assert res.history[-1] <= res.history[0] * 1.5


def test_walkforward_single_executable():
    """Retrain windows share one compiled executable (no per-window
    retrace: identical window shapes hit the jit cache)."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu.train.strategies import WalkForwardTrainer

    rng = np.random.default_rng(2)
    K, A = 3, 4
    q = rng.dirichlet(np.ones(K), size=400).astype(np.float32)
    rets = rng.normal(1e-3, 0.01, size=(400, 5, A)).astype(np.float32)

    def model(p, qq):
        return jax.nn.softmax(qq @ p, axis=-1)

    def loss_fn(w, r):
        pr = (w[:, None, :] * r).sum(-1)
        return -pr.mean() / jnp.maximum(jnp.std(pr, ddof=1), 1e-8)

    calls = {"n": 0}

    def counting_model(p, qq):
        calls["n"] += 1
        return model(p, qq)

    wf = WalkForwardTrainer(counting_model, jnp.zeros((K, A)), loss_fn,
                            train_window=100, test_window=20,
                            retrain_freq=20)
    out = wf.run((q, rets), n_periods=3)
    assert len(out) == 3
    assert all(np.isfinite(r["test_sharpe"]) for r in out)
    # one trace of the window fit (+ one eager model call per evaluate);
    # a per-window retrace would add one call per window
    assert calls["n"] == 1 + 3, calls


def test_train_portfolio_fused_matches_stepwise(frozen_vae, rng):
    """The single-scan fused head trainer must reproduce the step-wise
    train_portfolio per-epoch losses and final params (same math, ~2EN
    fewer dispatches)."""
    from vqvaehmm_tpu.train.heads import train_portfolio_fused

    vae, vae_params = frozen_vae
    head, head_params = _head()
    batches = _batches(rng, n_batches=3)
    rets = synthetic_returns(3, 8, horizon=20, n_assets=4, seed=2)

    ref = train_portfolio(head, head_params, vae, vae_params, batches,
                          rets, num_epochs=4, lr=0.01, log_fn=None)
    fused = train_portfolio_fused(head, head_params, vae, vae_params,
                                  batches, rets, num_epochs=4, lr=0.01)

    np.testing.assert_allclose(fused.history, ref.history, rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(fused.params),
                    jax.tree_util.tree_leaves(ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_head_trainers_reject_padded_batches():
    """Head trainers consume full windows (pointwise heads read t=T-1);
    a padded batch must be rejected loudly instead of silently training
    on padding."""
    import pytest

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               RegimePortfolioOptimizer)
    from vqvaehmm_tpu.train.heads import train_portfolio

    vae = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    vae_p = vae.init(jax.random.PRNGKey(0))
    head = RegimePortfolioOptimizer(HeadConfig(K=3, n_assets=4,
                                               hidden_dim=8))
    head_p = head.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 5, 20)).astype(np.float32)
    u = rng.normal(size=(4, 4, 20)).astype(np.float32)
    bad_lengths = np.array([20, 20, 12, 20], np.int32)  # one padded row
    rets = rng.normal(0, 0.01, size=(4, 19, 4)).astype(np.float32)

    with pytest.raises(ValueError, match="full windows"):
        train_portfolio(head, head_p, vae, vae_p,
                        [(x, u, bad_lengths)], [rets], num_epochs=1,
                        log_fn=None)


def test_walkforward_trainer_guards_and_lr_mutation():
    """n_epochs=0 is a no-op; run() rejects data too short for the
    requested windows; mutating lr between windows takes effect (the
    cached executable is keyed on it, not frozen at first call)."""
    import pytest

    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               RegimePortfolioOptimizer)
    from vqvaehmm_tpu.train.strategies import WalkForwardTrainer

    head = RegimePortfolioOptimizer(HeadConfig(K=3, n_assets=4,
                                               hidden_dim=8))
    params = head.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    q = rng.dirichlet(np.ones(3), size=100).astype(np.float32)
    rets = rng.normal(0, 0.01, size=(100, 4)).astype(np.float32)

    from vqvaehmm_tpu.losses import sharpe_loss

    wf = WalkForwardTrainer(head, params, sharpe_loss, train_window=40,
                            test_window=10, retrain_freq=10)

    p_before = jax.tree_util.tree_leaves(wf.params)
    assert wf.train_epoch((q[:40], rets[:40]), n_epochs=0) == 0.0
    for a, b in zip(p_before, jax.tree_util.tree_leaves(wf.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="need"):
        wf.run((q, rets), n_periods=20)

    wf.train_epoch((q[:40], rets[:40]), n_epochs=2)
    key1 = wf._fit[0]
    wf.lr = 1e-4
    wf.train_epoch((q[:40], rets[:40]), n_epochs=2)
    assert wf._fit[0] != key1  # new executable honoring the new lr
