"""HiddenMarkovModel class: covers the reference's TFP weather-model demo
(reference hmm.py:11-42) natively, plus Baum-Welch EM."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvaehmm_tpu.models.hmm import (CategoricalEmission, GaussianEmission,
                                     HiddenMarkovModel, fit_categorical_em)
from vqvaehmm_tpu.ops import hmm as ops


def weather_model():
    """The exact model from reference hmm.py:11-34."""
    return HiddenMarkovModel(
        initial_probs=[0.8, 0.2],
        transition_probs=[[0.7, 0.3], [0.2, 0.8]],
        emission=GaussianEmission(loc=jnp.array([0.0, 15.0]),
                                  scale=jnp.array([5.0, 10.0])),
        num_steps=7)


def test_mean_matches_tfp_docs():
    """tfd.HiddenMarkovModel docs: elements approach 9.0 (hmm.py:38)."""
    m = np.asarray(weather_model().mean())
    assert m.shape == (7,)
    # closed form: E[x_t] = (pi A^t) . loc
    pi = np.array([0.8, 0.2])
    A = np.array([[0.7, 0.3], [0.2, 0.8]])
    loc = np.array([0.0, 15.0])
    expect = []
    p = pi
    for _ in range(7):
        expect.append(p @ loc)
        p = p @ A
    np.testing.assert_allclose(m, expect, atol=1e-5)
    assert abs(m[-1] - 9.0) < 1.0  # approaches stationary value 9.0


def test_log_prob_matches_bruteforce():
    """model.log_prob(zeros(7)) (hmm.py:42) vs exact enumeration."""
    model = weather_model()
    x = np.zeros(7, np.float32)
    got = float(model.log_prob(x))

    import itertools
    pi = np.array([0.8, 0.2])
    A = np.array([[0.7, 0.3], [0.2, 0.8]])
    loc = np.array([0.0, 15.0])
    scale = np.array([5.0, 10.0])
    tot = -np.inf
    for path in itertools.product(range(2), repeat=7):
        lp = np.log(pi[path[0]])
        for t in range(1, 7):
            lp += np.log(A[path[t - 1], path[t]])
        for t, z in enumerate(path):
            lp += (-0.5 * ((0.0 - loc[z]) / scale[z]) ** 2
                   - np.log(scale[z]) - 0.5 * np.log(2 * np.pi))
        tot = np.logaddexp(tot, lp)
    assert abs(got - tot) < 1e-4


def test_posterior_mode_and_marginals_shapes():
    model = weather_model()
    x = np.array([0.0, 1.0, 14.0, 16.0, 15.0, 0.0, -1.0], np.float32)
    mode = np.asarray(model.posterior_mode(x))
    marg = np.asarray(model.posterior_marginals(x))
    assert mode.shape == (7,)
    assert marg.shape == (7, 2)
    # hot observations in the middle decode to the hot state
    assert mode[2] == 1 and mode[3] == 1
    assert mode[0] == 0
    np.testing.assert_allclose(marg.sum(-1), 1.0, atol=1e-5)
    # batched input works too
    mb = np.asarray(model.posterior_mode(np.stack([x, x])))
    np.testing.assert_array_equal(mb[0], mode)


def test_sample_shapes_and_em_recovery():
    """EM on sampled code sequences recovers a sticky transition kernel."""
    K = 3
    A = np.full((K, K), 0.05, np.float32)
    np.fill_diagonal(A, 0.9)
    # near-deterministic emission: state k emits code k
    B_em = np.full((K, K), 0.025, np.float32)
    np.fill_diagonal(B_em, 0.95)
    model = HiddenMarkovModel(np.full(K, 1 / 3), A,
                              CategoricalEmission(jnp.log(jnp.asarray(B_em))))
    states, obs = model.sample(jax.random.PRNGKey(0), num_steps=120,
                               batch=24)
    assert states.shape == (24, 120) and obs.shape == (24, 120)

    res = fit_categorical_em(obs, K=K, V=K, n_iters=40, seed=1)
    lls = np.asarray(res.log_likelihoods)
    assert lls[-1] >= lls[0]  # EM monotone (up to numeric noise)
    # learned transition should be sticky (diagonal-dominant up to relabel)
    A_hat = np.exp(np.asarray(res.model.log_A))
    perm_best = 0.0
    import itertools
    for perm in itertools.permutations(range(K)):
        p = np.asarray(perm)
        perm_best = max(perm_best, np.trace(A_hat[np.ix_(p, p)]) / K)
    assert perm_best > 0.7


def test_multivariate_gaussian_emission():
    """Vector-observation HMM: log_prob/posterior over (T, D) sequences."""
    import itertools

    K, D, T = 2, 3, 5
    rng = np.random.default_rng(4)
    loc = rng.normal(size=(K, D)).astype(np.float32)
    scale = (0.5 + rng.uniform(0, 1, size=(K, D))).astype(np.float32)
    model = HiddenMarkovModel([0.6, 0.4], [[0.8, 0.2], [0.3, 0.7]],
                              GaussianEmission(loc=jnp.asarray(loc),
                                               scale=jnp.asarray(scale)))
    x = rng.normal(size=(T, D)).astype(np.float32)
    got = float(model.log_prob(x))

    pi = np.array([0.6, 0.4])
    A = np.array([[0.8, 0.2], [0.3, 0.7]])
    tot = -np.inf
    for path in itertools.product(range(K), repeat=T):
        lp = np.log(pi[path[0]])
        for t in range(1, T):
            lp += np.log(A[path[t - 1], path[t]])
        for t, z in enumerate(path):
            lp += float(np.sum(-0.5 * ((x[t] - loc[z]) / scale[z]) ** 2
                               - np.log(scale[z])
                               - 0.5 * np.log(2 * np.pi)))
        tot = np.logaddexp(tot, lp)
    assert abs(got - tot) < 1e-3

    mode = model.posterior_mode(x)
    assert mode.shape == (T,)
    marg = model.posterior_marginals(np.stack([x, x]))
    assert marg.shape == (2, T, K)


def test_gaussian_em_recovers_regimes():
    """Baum-Welch with Gaussian emissions recovers sticky dynamics and
    separated means from sampled data."""
    from vqvaehmm_tpu.models import fit_gaussian_em

    K = 2
    A = np.array([[0.92, 0.08], [0.1, 0.9]], np.float32)
    true = HiddenMarkovModel([0.5, 0.5], A,
                             GaussianEmission(loc=jnp.array([-2.0, 2.0]),
                                              scale=jnp.array([0.7, 0.7])))
    states, obs = true.sample(jax.random.PRNGKey(0), num_steps=150,
                              batch=16)
    res = fit_gaussian_em(obs, K=K, n_iters=40, seed=1)
    lls = np.asarray(res.log_likelihoods)
    assert lls[-1] >= lls[0]

    loc = np.sort(np.asarray(res.model.emission.loc).ravel())
    np.testing.assert_allclose(loc, [-2.0, 2.0], atol=0.3)
    A_hat = np.exp(np.asarray(res.model.log_A))
    # diagonal-dominant up to state relabeling
    best = max(np.trace(A_hat) / K, np.trace(A_hat[::-1][:, ::-1]) / K)
    assert best > 0.8

    # decode accuracy vs ground truth (up to label permutation)
    decoded = np.asarray(res.model.posterior_mode(obs))
    s_np = np.asarray(states)
    acc = max((decoded == s_np).mean(), (1 - decoded == s_np).mean())
    assert acc > 0.85


def test_fit_transitions_em_recovers_dynamics_over_fixed_emissions():
    """fit_transitions_em learns (pi, A) with emissions held fixed: given
    the TRUE per-step emission log-densities, the learned A recovers the
    generating chain's stickiness, the data log-likelihood is
    non-decreasing, and Viterbi with the learned dynamics beats the
    static per-step argmax (the value of the chain isolated from the
    emission model — reference train_simple.py's GMM has no chain)."""
    from vqvaehmm_tpu.models import fit_transitions_em
    from vqvaehmm_tpu.ops import hmm as hmm_ops

    K = 2
    A = np.array([[0.95, 0.05], [0.06, 0.94]], np.float32)
    emission = GaussianEmission(loc=jnp.array([-1.0, 1.0]),
                                scale=jnp.array([1.4, 1.4]))  # weak evidence
    true = HiddenMarkovModel([0.5, 0.5], A, emission)
    states, obs = true.sample(jax.random.PRNGKey(2), num_steps=200,
                              batch=8)
    log_obs = emission.log_prob(obs)                    # (B, T, K), fixed

    log_pi, log_A, lls = fit_transitions_em(log_obs, n_iters=30)
    lls = np.asarray(lls)
    # non-decreasing up to f32 accumulation noise at convergence
    tol = 1e-5 * abs(float(lls[0]))
    assert (np.diff(lls) >= -tol).all(), "EM log-likelihood decreased"

    A_hat = np.exp(np.asarray(log_A))
    np.testing.assert_allclose(A_hat.sum(-1), 1.0, atol=1e-5)
    assert np.trace(A_hat) / K > 0.85, A_hat  # stickiness recovered

    s_np = np.asarray(states)
    static = np.asarray(log_obs.argmax(-1))
    vit = np.asarray(hmm_ops.viterbi(log_pi, log_A, log_obs).states)
    acc_static = (static == s_np).mean()
    acc_vit = (vit == s_np).mean()
    assert acc_vit > acc_static + 0.03, (acc_vit, acc_static)

    # ragged lengths run and stay normalized
    lengths = jnp.asarray(np.array([200, 150, 120, 200, 90, 60, 200, 30],
                                   np.int32))
    _, log_A_r, _ = fit_transitions_em(log_obs, n_iters=5, lengths=lengths)
    np.testing.assert_allclose(np.exp(np.asarray(log_A_r)).sum(-1), 1.0,
                               atol=1e-5)
