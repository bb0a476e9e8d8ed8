"""Loss-function parity vs straightforward numpy implementations of the
reference formulas (loss_functions.py, VQ_VAE_HMM_fixed.py:198-228,
delta_hedger.py:95-200)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.losses import (calmar_loss, delta_hedge_loss,
                                 minimum_variance_hedge_ratio,
                                 optimal_hedge_frequency, portfolio_loss,
                                 regime_aware_sharpe_loss,
                                 regime_conditional_loss, risk_parity_loss,
                                 sharpe_loss, sortino_loss,
                                 transition_aware_loss)


@pytest.fixture
def data(rng):
    B, T, A, K = 6, 40, 4, 3
    w = rng.dirichlet(np.ones(A), size=B).astype(np.float32)
    r = rng.normal(5e-4, 0.01, size=(B, T, A)).astype(np.float32)
    q = rng.dirichlet(np.ones(K), size=(B, T)).astype(np.float32)
    q_kt = np.transpose(q, (0, 2, 1))  # (B,K,T)
    Amat = rng.dirichlet(np.ones(K), size=(B, T, K)).astype(np.float32)
    return w, r, q_kt, Amat


def np_sharpe(w, r, rf=0.0):
    pr = (w[:, None, :] * r).sum(-1).astype(np.float64)
    mu = pr.mean(1)
    sd = pr.std(1, ddof=1)
    return -((mu - rf) / np.maximum(sd, 1e-8)).mean()


def test_sharpe_loss(data):
    w, r, _, _ = data
    ours = float(sharpe_loss(jnp.asarray(w), jnp.asarray(r)))
    assert abs(ours - np_sharpe(w, r)) < 1e-5


def test_sortino_loss(data):
    w, r, _, _ = data
    pr = (w[:, None, :] * r).sum(-1).astype(np.float64)
    mu = pr.mean(1)
    downside = np.minimum(pr, 0.0)
    dstd = np.maximum(np.sqrt((downside ** 2).mean(1)), 1e-8)
    ref = -(mu / dstd).mean()
    ours = float(sortino_loss(jnp.asarray(w), jnp.asarray(r)))
    assert abs(ours - ref) < 1e-5


def test_calmar_loss(data):
    w, r, _, _ = data
    pr = (w[:, None, :] * r).sum(-1).astype(np.float64)
    cum = np.cumsum(pr, 1)
    runmax = np.maximum.accumulate(cum, 1)
    mdd = np.maximum((runmax - cum).max(1), 1e-8)
    ref = -(pr.mean(1) / mdd).mean()
    ours = float(calmar_loss(jnp.asarray(w), jnp.asarray(r)))
    assert abs(ours - ref) < 1e-5


def test_portfolio_loss_components(data):
    """Full multi-objective loss vs numpy reference implementation."""
    w, r, q, _ = data
    B, T, A = r.shape
    prev = np.roll(w, 1, axis=0)

    pr = (w[:, None, :] * r).sum(-1).astype(np.float64)
    sharpe = ((pr.mean(1)) / np.maximum(pr.std(1, ddof=1), 1e-8))
    turnover = 0.001 * np.abs(w - prev).sum(-1).mean()
    pos_pen = np.maximum(w - 0.3, 0).sum(-1).mean()
    lev_pen = np.maximum(w.sum(-1) - 1.0, 0).mean()
    cum = np.cumsum(pr, 1)
    mdd = (np.maximum.accumulate(cum, 1) - cum).max(1).mean()
    var_idx = int(0.05 * T)
    srt = np.sort(pr, 1)
    cvar = -srt[:, :var_idx].mean()
    ref = (-sharpe.mean() + 0.1 * turnover + pos_pen + lev_pen
           + 0.1 * mdd + 0.1 * cvar)

    ours = float(portfolio_loss(jnp.asarray(w), jnp.asarray(r),
                                prev_weights=jnp.asarray(prev)))
    assert abs(ours - ref) < 1e-5


def test_risk_parity_loss_nonnegative_and_finite(data):
    w, r, _, _ = data
    v = float(risk_parity_loss(jnp.asarray(w), jnp.asarray(r)))
    assert np.isfinite(v) and v >= 0


def test_regime_conditional_loss_matches_loop(data):
    """Vectorized einsum version vs a literal per-K loop in numpy."""
    w, r, q_kt, _ = data
    K = q_kt.shape[1]
    B, T, A = r.shape
    rp = np.transpose(q_kt, (0, 2, 1)).astype(np.float64)  # (B,T,K)
    r64 = r.astype(np.float64)
    w64 = w.astype(np.float64)
    total = 0.0
    for k in range(K):
        wt = rp[:, :, k][:, :, None]
        wr = r64 * wt
        cen = wr - wr.mean(1, keepdims=True)
        cov = np.einsum("bta,btc->bac", cen, cen) / T
        pv = np.einsum("ba,bac,bc->b", w64, cov, w64)
        prt = (w64[:, None, :] * wr).sum(-1)
        sharpe_k = prt.mean(1) / np.sqrt(np.maximum(pv, 1e-8))
        total -= sharpe_k.mean() * rp[:, -1, k].mean()
    ours = float(regime_conditional_loss(jnp.asarray(w), jnp.asarray(r),
                                         jnp.asarray(q_kt), K))
    assert abs(ours - total) < 1e-4


def test_transition_aware_loss(data):
    w, r, q_kt, Amat = data
    ours = float(transition_aware_loss(jnp.asarray(w), jnp.asarray(r),
                                       jnp.asarray(q_kt), jnp.asarray(Amat)))
    # numpy reference
    cur = q_kt[:, :, -1].astype(np.float64)
    A_last = Amat[:, -1].astype(np.float64)
    fut = cur.copy()
    for _ in range(5):
        fut = np.einsum("bk,bkj->bj", fut, A_last)
    change = 1 - (cur * fut).sum(-1)
    pr = (w[:, None, :] * r).sum(-1).astype(np.float64)
    sharpe = pr.mean(1) / np.maximum(pr.std(1, ddof=1), 1e-8)
    ref = -(sharpe - 0.001 * change).mean()
    assert abs(ours - ref) < 1e-5


def test_regime_aware_sharpe_loss(data):
    """Vs numpy reference: per-step confidence weighting + duration penalty
    (reference: VQ_VAE_HMM_fixed.py:214-228)."""
    w, r, q_kt, Amat = data
    v = float(regime_aware_sharpe_loss(jnp.asarray(w), jnp.asarray(r),
                                       jnp.asarray(q_kt),
                                       jnp.asarray(Amat[:, -1])))
    rp = np.transpose(q_kt, (0, 2, 1)).astype(np.float64)  # (B,T,K)
    conf = rp.max(-1)
    pr = (w[:, None, :] * r).sum(-1).astype(np.float64) * conf
    diag = np.diagonal(Amat[:, -1], axis1=-2, axis2=-1).mean(-1)
    duration = 1.0 / (1.0 - diag + 1e-8)
    penalty = 0.01 / np.maximum(duration, 1.0)
    sharpe = pr.mean(1) / np.maximum(pr.std(1, ddof=1), 1e-8)
    ref = -(sharpe.mean() - penalty.mean())
    assert abs(v - ref) < 1e-5


def test_delta_hedge_loss(rng):
    B, T, A = 4, 30, 3
    h = rng.normal(size=(B, A)).astype(np.float32)
    spot = rng.normal(0, 0.01, size=(B, T, A)).astype(np.float32)
    fut = rng.normal(0, 0.01, size=(B, T, A)).astype(np.float32)
    ours = float(delta_hedge_loss(jnp.asarray(h), jnp.asarray(spot),
                                  jnp.asarray(fut)))
    hedged = spot + h[:, None, :] * fut
    ref = hedged.astype(np.float64).var(1, ddof=1).mean()
    assert abs(ours - ref) < 1e-6


def test_minimum_variance_hedge_ratio_regime_weighted(rng):
    B, T, A, K = 3, 25, 2, 3
    spot = rng.normal(0, 0.01, size=(B, T, A)).astype(np.float32)
    fut = rng.normal(0, 0.01, size=(B, T, A)).astype(np.float32)
    q = rng.dirichlet(np.ones(K), size=(B, T)).astype(np.float32)
    q_kt = np.transpose(q, (0, 2, 1))
    ours = np.asarray(minimum_variance_hedge_ratio(
        jnp.asarray(spot), jnp.asarray(fut), jnp.asarray(q_kt), K))
    # literal loop reference
    rp = q.astype(np.float64)
    ratios = []
    for k in range(K):
        wt = rp[:, :, k][:, :, None]
        sw = spot * wt
        fw = fut * wt
        cov = (sw * fw).sum(1) / np.maximum(wt.sum(1), 1e-8)
        var = (fw ** 2).sum(1) / np.maximum(wt.sum(1), 1e-8)
        ratios.append(cov / np.maximum(var, 1e-8))
    ratios = np.stack(ratios, 1)  # (B,K,A)
    ref = (ratios * rp[:, -1, :][:, :, None]).sum(1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
    # unweighted path
    u = np.asarray(minimum_variance_hedge_ratio(jnp.asarray(spot),
                                                jnp.asarray(fut)))
    ref_u = (spot * fut).mean(1) / np.maximum((fut ** 2).mean(1), 1e-8)
    np.testing.assert_allclose(u, ref_u, rtol=1e-4)


def test_optimal_hedge_frequency():
    v = np.asarray(optimal_hedge_frequency(
        jnp.asarray(0.2), jnp.asarray(0.001), jnp.asarray(2.0)))
    ref = np.sqrt(8 * 0.001 / (np.pi * 0.04)) / 2.0
    assert abs(float(v) - ref) < 1e-6


def test_adversarial_portfolio_loss(rng):
    """FGSM loss: must be >= the clean loss when the model is sensitive to
    its input (perturbation is adversarial by construction)."""
    from vqvaehmm_tpu.losses import adversarial_portfolio_loss
    from vqvaehmm_tpu.models import HeadConfig, RegimePortfolioOptimizer

    B, T, A, K = 4, 20, 5, 3
    head = RegimePortfolioOptimizer(HeadConfig(K=K, n_assets=A,
                                               hidden_dim=8))
    params = head.init(jax.random.PRNGKey(0))
    q = jnp.asarray(rng.dirichlet(np.ones(K), size=B).astype(np.float32))
    rets = jnp.asarray(rng.normal(1e-3, 0.01, size=(B, T, A))
                       .astype(np.float32))

    def model_fn(rp):
        return head(params, rp)

    adv = float(adversarial_portfolio_loss(model_fn, q, rets, epsilon=0.05))
    clean = float(-(model_fn(q)[:, None, :] * rets).sum(-1).mean())
    assert np.isfinite(adv)
    # gradient flows THROUGH the adversarial perturbation (second-order)
    g = jax.grad(lambda p: adversarial_portfolio_loss(
        lambda rp: head(p, rp), q, rets))(params)
    assert any(np.any(np.asarray(l) != 0)
               for l in jax.tree_util.tree_leaves(g))


def test_calibrate_probabilities_matches_reference_binning(rng):
    """Reliability-diagram binning (regime_utilities.py:56-73): per-bin
    (mean confidence, accuracy) pairs over argmax predictions."""
    from vqvaehmm_tpu.models import calibrate_probabilities

    B, T, K = 50, 1, 3
    probs = rng.dirichlet(np.ones(K), size=(B, T)).astype(np.float32)
    true = rng.integers(0, K, size=(B, T))

    got = calibrate_probabilities(probs, true, n_bins=10)

    maxp = probs.max(axis=-1)
    pred = probs.argmax(axis=-1)
    edges = np.linspace(0, 1, 11)
    want = []
    for i in range(10):
        m = (maxp >= edges[i]) & (maxp < edges[i + 1])
        if m.sum() > 0:
            want.append((maxp[m].mean(), (pred[m] == true[m]).mean()))
    assert len(got) == len(want)
    for (gc, ga), (wc, wa) in zip(got, want):
        assert abs(gc - wc) < 1e-6 and abs(ga - wa) < 1e-6
    # every returned bin is (confidence, accuracy) in [0,1]
    assert all(0 <= c <= 1 and 0 <= a <= 1 for c, a in got)


def test_optimize_rebalancing_frequency_matches_reference(rng):
    """sqrt(cost / 2 sigma) * 252 clamped to [1, max_freq]
    (regime_utilities.py:156-165; torch .std() is ddof=1)."""
    from vqvaehmm_tpu.models import optimize_rebalancing_frequency

    B, T, K = 4, 60, 3
    q = rng.dirichlet(np.ones(K), size=(B, T)).astype(np.float32)
    A = rng.dirichlet(np.ones(K), size=(B, K)).astype(np.float32)
    r = rng.normal(0, 0.01, size=(B, T)).astype(np.float32)

    got = int(optimize_rebalancing_frequency(q, A, r,
                                             transaction_cost=0.001,
                                             max_freq=21))
    vol = np.std(r, axis=1, ddof=1).mean()
    want = int(np.clip(np.sqrt(0.001 / (2 * vol)) * 252, 1, 21))
    assert got == want

    # a tiny cost pushes the frequency to the daily floor
    lo = int(optimize_rebalancing_frequency(q, A, r,
                                            transaction_cost=1e-9))
    assert lo == 1


def test_risk_parity_matches_reference_formula(rng, data):
    """Value parity vs a literal numpy port of the reference formula
    (loss_functions.py:70-86): centered /T (biased) covariance, risk
    contributions vs their mean."""
    w, r, _, _ = data
    from vqvaehmm_tpu.losses import risk_parity_loss

    got = float(risk_parity_loss(jnp.asarray(w), jnp.asarray(r)))

    B, T, A = r.shape
    centered = r - r.mean(axis=1, keepdims=True)
    cov = np.einsum("bta,btc->bac", centered, centered) / T
    port_var = np.einsum("ba,bac,bc->b", w, cov, w)
    port_std = np.sqrt(np.maximum(port_var, 1e-8))
    marginal = np.einsum("bac,bc->ba", cov, w)
    rc = w * marginal / port_std[:, None]
    want = (((rc - rc.mean(-1, keepdims=True)) ** 2).sum(-1)).mean()
    assert abs(got - want) < 1e-5


def test_transition_aware_accepts_both_layouts(rng, data):
    """(B,K,T) — the reference's declared layout — and (B,T,K) give the
    same value (disambiguated against returns' T)."""
    from vqvaehmm_tpu.losses import transition_aware_loss

    w, r, q_kt, Amat = data
    a = float(transition_aware_loss(jnp.asarray(w), jnp.asarray(r),
                                    jnp.asarray(q_kt), jnp.asarray(Amat)))
    q_tk = np.transpose(q_kt, (0, 2, 1))
    b = float(transition_aware_loss(jnp.asarray(w), jnp.asarray(r),
                                    jnp.asarray(q_tk), jnp.asarray(Amat)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_regime_aware_sharpe_accepts_transition_stack(rng, data):
    """Passing the full (B,T,K,K) stack equals passing the last step's
    (B,K,K) matrix (the reference uses the final A)."""
    from vqvaehmm_tpu.losses import regime_aware_sharpe_loss

    w, r, q_kt, Amat = data
    q_tk = np.transpose(q_kt, (0, 2, 1))
    a = float(regime_aware_sharpe_loss(jnp.asarray(w), jnp.asarray(r),
                                       jnp.asarray(q_tk),
                                       jnp.asarray(Amat)))
    b = float(regime_aware_sharpe_loss(jnp.asarray(w), jnp.asarray(r),
                                       jnp.asarray(q_tk),
                                       jnp.asarray(Amat[:, -1])))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_optimal_hedge_frequency_zero_vol_guard():
    from vqvaehmm_tpu.losses import optimal_hedge_frequency

    f = optimal_hedge_frequency(jnp.float32(0.0), 0.001, jnp.float32(2.0))
    assert np.isfinite(float(f))
