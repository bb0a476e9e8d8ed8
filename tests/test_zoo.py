"""Downstream model zoo: shapes, simplex outputs, jit-compatibility, and
the reference's (B,K)/(B,K,T) dim-sniffing convention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.models import (AttentionPortfolioOptimizer,
                                 BayesianPortfolioOptimizer,
                                 DynamicDeltaHedger,
                                 EnsemblePortfolioOptimizer,
                                 ForwardTransitionPredictor, HeadConfig,
                                 HierarchicalPortfolioOptimizer,
                                 ImprovedPortfolioOptimizer,
                                 LSTMDeltaHedger, RegimeChangeDetector,
                                 RegimeDeltaHedger, RegimeFactorModel,
                                 RegimeLSTMOptimizer,
                                 RegimePersistenceModel,
                                 RegimePortfolioOptimizer,
                                 TemperatureScaling,
                                 TransactionCostAwareHedger,
                                 TransformerPortfolioOptimizer,
                                 TransitionAwareHedger,
                                 confidence_based_sizing,
                                 estimate_regime_covariance,
                                 optimize_leverage)

CFG = HeadConfig(K=3, n_assets=10, hidden_dim=16)
B, T = 4, 12


@pytest.fixture
def q3(rng):
    q = rng.dirichlet(np.ones(3), size=(B, T)).astype(np.float32)
    return jnp.asarray(np.transpose(q, (0, 2, 1)))  # (B,K,T)


def _check_weights(w, n_assets=10):
    w = np.asarray(w)
    assert w.shape == (B, n_assets)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert (w >= 0).all()


POINTWISE = [RegimePortfolioOptimizer, BayesianPortfolioOptimizer,
             EnsemblePortfolioOptimizer, HierarchicalPortfolioOptimizer,
             ImprovedPortfolioOptimizer]


@pytest.mark.parametrize("cls", POINTWISE)
def test_pointwise_optimizers_both_input_shapes(cls, q3):
    m = cls(CFG)
    p = m.init(jax.random.PRNGKey(0))
    w_seq = jax.jit(lambda pp, qq: m(pp, qq))(p, q3)
    _check_weights(w_seq)
    w_last = m(p, q3[:, :, -1])
    np.testing.assert_allclose(np.asarray(w_seq), np.asarray(w_last),
                               atol=1e-6)


@pytest.mark.parametrize("cls", [AttentionPortfolioOptimizer,
                                 TransformerPortfolioOptimizer,
                                 RegimeLSTMOptimizer])
def test_sequence_optimizers(cls, q3):
    m = cls(CFG)
    p = m.init(jax.random.PRNGKey(1))
    w = jax.jit(lambda pp, qq: m(pp, qq))(p, q3)
    _check_weights(w)


def test_bayesian_mc_sampling(q3):
    m = BayesianPortfolioOptimizer(CFG, n_samples=16)
    p = m.init(jax.random.PRNGKey(2))
    w, unc = m(p, q3, key=jax.random.PRNGKey(3), return_uncertainty=True)
    _check_weights(w)
    assert np.asarray(unc).shape == (B, 10)
    assert (np.asarray(unc) >= 0).all()
    # deterministic path is reproducible
    w1 = m(p, q3)
    w2 = m(p, q3)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_improved_dropout_modes(q3):
    # keyless call = reference eval mode (deterministic); key = training
    # mode with Dropout(0.2) active (train_simple.py:42,45) — stochastic
    # but still a valid simplex mixture.
    m = ImprovedPortfolioOptimizer(CFG)
    p = m.init(jax.random.PRNGKey(5))
    w1 = m(p, q3)
    w2 = m(p, q3)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    wa = m(p, q3, key=jax.random.PRNGKey(6))
    wb = m(p, q3, key=jax.random.PRNGKey(7))
    _check_weights(wa)
    _check_weights(wb)
    assert np.abs(np.asarray(wa) - np.asarray(wb)).max() > 1e-6
    # same key reproduces
    wc = m(p, q3, key=jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wc))


def test_transformer_accepts_last_step_input(q3):
    # (B,K) arrival shape = length-1 sequence (reference unsqueezes:
    # portfolio_optimizer.py:23-35 feeds whatever the caller has).
    m = TransformerPortfolioOptimizer(CFG)
    p = m.init(jax.random.PRNGKey(4))
    w_2d = m(p, q3[:, :, -1])
    _check_weights(w_2d)
    w_len1 = m(p, q3[:, :, -1:])
    np.testing.assert_allclose(np.asarray(w_2d), np.asarray(w_len1),
                               atol=1e-6)


def test_bayesian_uncertainty_requires_key_and_samples(q3):
    m = BayesianPortfolioOptimizer(CFG, n_samples=16)
    p = m.init(jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match="requires key="):
        m(p, q3, return_uncertainty=True)
    m1 = BayesianPortfolioOptimizer(CFG, n_samples=1)
    p1 = m1.init(jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match="n_samples >= 2"):
        m1(p1, q3, key=jax.random.PRNGKey(3), return_uncertainty=True)


def test_attention_heads_divisibility():
    with pytest.raises(ValueError):
        AttentionPortfolioOptimizer(CFG, n_heads=4).init(
            jax.random.PRNGKey(0))


def test_hedgers(q3, rng):
    spot = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    pos = jnp.ones((B, 10), jnp.float32)

    h1 = RegimeDeltaHedger(CFG)
    p1 = h1.init(jax.random.PRNGKey(0))
    hedge, delta = jax.jit(lambda p, q, s, o: h1(p, q, s, o))(p1, q3, spot,
                                                              pos)
    assert hedge.shape == (B, 10) and delta.shape == (B, 10)
    assert (np.abs(np.asarray(delta)) <= 1).all()  # tanh bounded

    h2 = DynamicDeltaHedger(CFG)
    p2 = h2.init(jax.random.PRNGKey(1))
    gamma = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    total, delta = h2(p2, q3, spot, pos, gamma)
    assert total.shape == (B, 10)
    # no-gamma variant uses its own (smaller) input dim, as in the
    # reference (delta_hedger.py:41: input_dim depends on use_gamma)
    h2n = DynamicDeltaHedger(CFG, use_gamma=False)
    p2n = h2n.init(jax.random.PRNGKey(11))
    total_ng, delta_ng = h2n(p2n, q3, spot, pos, None)
    np.testing.assert_array_equal(np.asarray(total_ng), np.asarray(delta_ng))

    h3 = LSTMDeltaHedger(CFG)
    p3 = h3.init(jax.random.PRNGKey(2))
    prices = jnp.asarray(rng.normal(size=(B, T, 10)).astype(np.float32))
    out = h3(p3, q3, prices)
    assert out.shape == (B, 10)

    h4 = TransactionCostAwareHedger(CFG)
    p4 = h4.init(jax.random.PRNGKey(3))
    cur = jnp.zeros((B, 10))
    new_hedge, cost = h4(p4, q3, cur, None, spot)
    assert new_hedge.shape == (B, 10) and cost.shape == (B,)

    h5 = TransitionAwareHedger(CFG, lookahead=5)
    p5 = h5.init(jax.random.PRNGKey(4))
    A = jnp.asarray(rng.dirichlet(np.ones(3), size=(B, T, 3))
                    .astype(np.float32))
    out = jax.jit(lambda p, q, a, s: h5(p, q, a, s))(p5, q3, A, spot)
    assert out.shape == (B, 10)
    assert (np.abs(np.asarray(out)) <= 1).all()


def test_regime_models(q3, rng):
    det = RegimeChangeDetector(3, hidden_dim=8)
    p = det.init(jax.random.PRNGKey(0))
    prob = det(p, q3)
    assert prob.shape == (B, 1)
    assert ((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1)).all()

    fwd = ForwardTransitionPredictor(3, n_steps=5, hidden_dim=8)
    p = fwd.init(jax.random.PRNGKey(1))
    future = fwd(p, q3)
    assert future.shape == (B, 5, 3)
    np.testing.assert_allclose(np.asarray(future).sum(-1), 1.0, atol=1e-5)

    per = RegimePersistenceModel(3, hidden_dim=8)
    p = per.init(jax.random.PRNGKey(2))
    A = jnp.asarray(rng.dirichlet(np.ones(3), size=(B, 3))
                    .astype(np.float32))
    dur = per(p, q3, A)
    assert dur.shape == (B, 1)
    assert (np.asarray(dur) > 0).all()

    fm = RegimeFactorModel(3, n_assets=4, n_factors=2)
    p = fm.init(jax.random.PRNGKey(3))
    cov = fm.get_covariance(p, q3)
    assert cov.shape == (B, 4, 4)
    cov_np = np.asarray(cov)
    np.testing.assert_allclose(cov_np, np.swapaxes(cov_np, 1, 2), atol=1e-5)
    eig = np.linalg.eigvalsh(cov_np)
    assert (eig > 0).all()  # PSD + specific risk => PD


def test_temperature_scaling(rng):
    """Calibrating logits scaled by 3x should learn temperature ~3."""
    ts = TemperatureScaling()
    p = ts.init()
    true_logits = rng.normal(size=(600, 3)).astype(np.float32) * 1.0
    labels = np.array([np.random.default_rng(i).choice(
        3, p=np.exp(l) / np.exp(l).sum()) for i, l in
        enumerate(true_logits)]).astype(np.int32)
    hot_logits = true_logits * 3.0  # over-confident
    p, temp = ts.calibrate(p, hot_logits, labels, lr=0.05, max_iter=300)
    assert 2.0 < temp < 4.5, temp


def test_utility_functions(q3, rng):
    rets = jnp.asarray(rng.normal(0, 0.01, size=(B, T, 4))
                       .astype(np.float32))
    cov = estimate_regime_covariance(rets, q3, 3)
    assert cov.shape == (B, 3, 4, 4)

    w = jnp.asarray(rng.dirichlet(np.ones(4), size=B).astype(np.float32))
    sized = confidence_based_sizing(w, q3)
    np.testing.assert_allclose(np.asarray(sized).sum(-1), 1.0, atol=1e-5)

    lev = optimize_leverage(w, rets)
    assert lev.shape == (B, 4)


def test_temperature_scaling_reaches_far_optima_with_defaults():
    """Log-space Adam must recover a 10x temperature with the DEFAULT
    budget (plain Adam's additive steps capped the reach at ~lr*iters
    from the 1.0 init — the reference's LBFGS had no such limit)."""
    rng = np.random.default_rng(5)
    true_logits = rng.normal(size=(600, 3)).astype(np.float32)
    labels = np.array([np.random.default_rng(i).choice(
        3, p=np.exp(l) / np.exp(l).sum()) for i, l in
        enumerate(true_logits)]).astype(np.int32)
    ts = TemperatureScaling()
    p, temp = ts.calibrate(ts.init(), true_logits * 10.0, labels)
    assert 6.0 < temp < 16.0, temp


def test_lstm_regime_models_square_input_untransposed():
    """Square (B, K, K) inputs pass through UNTRANSPOSED — the reference
    LSTM models consume (B, T, K) directly with no layout sniff
    (regime_utilities.py:14-16), so the square tie-break must not apply
    VQ_VAE_HMM's transpose idiom here."""
    rng = np.random.default_rng(7)
    det = RegimeChangeDetector(3, hidden_dim=8)
    p = det.init(jax.random.PRNGKey(0))
    q_sq = jnp.asarray(rng.dirichlet(np.ones(3), size=(4, 3))
                       .astype(np.float32))       # (B, T=3, K=3)
    a = np.asarray(det(p, q_sq))
    b = np.asarray(det(p, jnp.transpose(q_sq, (0, 2, 1))))
    # if the sniff transposed squares, a and b would be identical runs
    # of the same (transposed) array; the reference treats them as two
    # DIFFERENT sequences
    assert not np.allclose(a, b)
