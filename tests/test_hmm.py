"""Exact HMM inference vs brute-force chain enumeration (float64 numpy).

The oracle enumerates all K^T hidden paths, so any systematic error in the
scans (indexing convention, masking, log-space numerics) shows up
immediately.  Covers: forward likelihood, posterior marginals, pairwise
marginals, Viterbi, associative-scan variants, ragged lengths.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.ops import hmm


def brute_force(log_pi, log_A, log_obs):
    """All-paths enumeration. log_A: (T,K,K) (entry t used *into* step t);
    returns (ll, gamma:(T,K), xi:(T-1,K,K), viterbi_path, viterbi_score)."""
    T, K = log_obs.shape
    paths = list(itertools.product(range(K), repeat=T))
    lps = np.empty(len(paths))
    for i, z in enumerate(paths):
        lp = log_pi[z[0]] + log_obs[0, z[0]]
        for t in range(1, T):
            lp += log_A[t, z[t - 1], z[t]] + log_obs[t, z[t]]
        lps[i] = lp
    m = lps.max()
    ll = m + np.log(np.exp(lps - m).sum())
    post = np.exp(lps - ll)
    gamma = np.zeros((T, K))
    xi = np.zeros((T - 1, K, K))
    for p, w in zip(paths, post):
        for t, z in enumerate(p):
            gamma[t, z] += w
        for t in range(T - 1):
            xi[t, p[t], p[t + 1]] += w
    best = int(np.argmax(lps))
    return ll, gamma, xi, np.array(paths[best]), lps[best]


def _random_hmm(B, T, K, seed=0, time_varying=True):
    rng = np.random.default_rng(seed)
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    if time_varying:
        A = rng.dirichlet(np.ones(K), size=(B, T, K)).astype(np.float32)
        log_A = np.log(A)
    else:
        A = rng.dirichlet(np.ones(K), size=K).astype(np.float32)
        log_A = np.log(A)
    log_obs = rng.normal(-1.0, 1.0, size=(B, T, K)).astype(np.float32)
    return log_pi, log_A, log_obs


@pytest.mark.parametrize("K,T", [(2, 5), (3, 4)])
@pytest.mark.parametrize("time_varying", [True, False])
def test_forward_backward_viterbi_vs_bruteforce(K, T, time_varying):
    B = 3
    log_pi, log_A, log_obs = _random_hmm(B, T, K, seed=K * 10 + T,
                                         time_varying=time_varying)
    fwd = hmm.forward(log_pi, jnp.asarray(log_A), jnp.asarray(log_obs))
    gamma = hmm.posterior_marginals(log_pi, jnp.asarray(log_A),
                                    jnp.asarray(log_obs))
    xi = hmm.pairwise_marginals(log_pi, jnp.asarray(log_A),
                                jnp.asarray(log_obs))
    vit = hmm.viterbi(log_pi, jnp.asarray(log_A), jnp.asarray(log_obs))
    fwd_a = hmm.forward_assoc(log_pi, jnp.asarray(log_A),
                              jnp.asarray(log_obs))
    _, vscore_a = hmm.viterbi_assoc_scores(log_pi, jnp.asarray(log_A),
                                           jnp.asarray(log_obs))

    for b in range(B):
        lA_b = log_A[b] if time_varying else \
            np.broadcast_to(log_A, (T, K, K))
        ll, g, x, path, score = brute_force(
            log_pi.astype(np.float64), lA_b.astype(np.float64),
            log_obs[b].astype(np.float64))
        assert abs(float(fwd.log_likelihood[b]) - ll) < 1e-4
        assert abs(float(fwd_a.log_likelihood[b]) - ll) < 1e-4
        np.testing.assert_allclose(np.asarray(gamma[b]), g, atol=1e-4)
        np.testing.assert_allclose(np.asarray(xi[b]), x, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vit.states[b]), path)
        assert abs(float(vit.score[b]) - score) < 1e-4
        assert abs(float(vscore_a[b]) - score) < 1e-4
        np.testing.assert_allclose(
            np.asarray(fwd.log_alpha[b]), np.asarray(fwd_a.log_alpha[b]),
            atol=1e-4)


def test_ragged_lengths_match_truncated():
    """With lengths, results at valid steps must equal running each sequence
    at its true length — proving identity-transition masking is exact."""
    B, T, K = 2, 6, 3
    log_pi, log_A, log_obs = _random_hmm(B, T, K, seed=7)
    lengths = np.array([6, 4], np.int32)

    fwd = hmm.forward(log_pi, jnp.asarray(log_A), jnp.asarray(log_obs),
                      jnp.asarray(lengths))
    gamma = hmm.posterior_marginals(log_pi, jnp.asarray(log_A),
                                    jnp.asarray(log_obs),
                                    jnp.asarray(lengths))
    vit = hmm.viterbi(log_pi, jnp.asarray(log_A), jnp.asarray(log_obs),
                      jnp.asarray(lengths))

    xi = hmm.pairwise_marginals(log_pi, jnp.asarray(log_A),
                                jnp.asarray(log_obs),
                                jnp.asarray(lengths))

    for b, L in enumerate(lengths):
        ll, g, x, path, score = brute_force(
            log_pi.astype(np.float64),
            log_A[b, :L].astype(np.float64),
            log_obs[b, :L].astype(np.float64))
        assert abs(float(fwd.log_likelihood[b]) - ll) < 1e-4
        np.testing.assert_allclose(np.asarray(gamma[b, :L]), g, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vit.states[b, :L]), path)
        assert abs(float(vit.score[b]) - score) < 1e-4
        # xi: exact at valid pairs AND zero at padded pairs — summing
        # over time (Baum-Welch M-step) must not overcount diagonals
        np.testing.assert_allclose(np.asarray(xi[b, :L - 1]), x,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(xi[b, L - 1:]),
                                      np.zeros_like(xi[b, L - 1:]))


def test_log_A_shape_validation():
    """(B,K,K) stationary-per-batch and mis-sized 4-D log_A are rejected
    with clear errors (B==T would silently transpose the semantics)."""
    import pytest

    B, T, K = 3, 3, 2  # B == T: the dangerous square case
    log_pi, _, log_obs = _random_hmm(B, T, K, seed=9, time_varying=False)
    rng = np.random.default_rng(9)
    per_batch = np.log(rng.dirichlet(np.ones(K), size=(4, K))
                       .astype(np.float32))  # (4,K,K) != (T,K,K)
    with pytest.raises(ValueError, match="3-D log_A"):
        hmm.forward(log_pi, jnp.asarray(per_batch), jnp.asarray(log_obs))
    bad4 = np.zeros((B + 1, T, K, K), np.float32)
    with pytest.raises(ValueError, match="4-D log_A"):
        hmm.forward(log_pi, jnp.asarray(bad4), jnp.asarray(log_obs))


def test_sample_statistics():
    """Empirical transition frequencies approach the true kernel."""
    K = 3
    rng = np.random.default_rng(0)
    A = rng.dirichlet(np.full(K, 5.0), size=K).astype(np.float32)
    log_pi = np.log(np.full(K, 1.0 / K, np.float32))
    paths = hmm.sample(jax.random.PRNGKey(0), jnp.asarray(log_pi),
                       jnp.asarray(np.log(A)), num_steps=200, batch=200)
    paths = np.asarray(paths)
    assert paths.shape == (200, 200)
    counts = np.zeros((K, K))
    for b in range(paths.shape[0]):
        for t in range(1, paths.shape[1]):
            counts[paths[b, t - 1], paths[b, t]] += 1
    emp = counts / counts.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(emp, A, atol=0.02)


def test_posterior_rows_normalize():
    log_pi, log_A, log_obs = _random_hmm(4, 16, 3, seed=3)
    gamma = hmm.posterior_marginals(log_pi, jnp.asarray(log_A),
                                    jnp.asarray(log_obs))
    np.testing.assert_allclose(np.asarray(gamma).sum(-1), 1.0, atol=1e-5)


def test_long_sequence_associative_scan():
    """O(log T) associative scan stays exact and stable at T=4096."""
    rng = np.random.default_rng(0)
    B, T, K = 2, 4096, 3
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    A = np.full((K, K), 0.05, np.float32)
    np.fill_diagonal(A, 0.9)
    log_obs = rng.normal(-1, 1, size=(B, T, K)).astype(np.float32)
    f_scan = hmm.forward(jnp.asarray(log_pi), jnp.asarray(np.log(A)),
                         jnp.asarray(log_obs))
    f_assoc = hmm.forward_assoc(jnp.asarray(log_pi), jnp.asarray(np.log(A)),
                                jnp.asarray(log_obs))
    # f32 accumulation order differs between the sequential and the tree
    # reduction; drift is O(T * eps * |ll|) — observed ~4e-5 relative at
    # T=4096, bound it at 1e-4 relative.
    np.testing.assert_allclose(np.asarray(f_scan.log_likelihood),
                               np.asarray(f_assoc.log_likelihood),
                               rtol=1e-4)
    assert np.isfinite(np.asarray(f_assoc.log_alpha)).all()


def test_length_one_sequences():
    """Degenerate T=1: likelihood is just pi + obs."""
    log_pi = jnp.log(jnp.asarray([0.25, 0.75]))
    log_A = jnp.log(jnp.asarray([[0.5, 0.5], [0.5, 0.5]]))
    log_obs = jnp.asarray(np.array([[[0.1, -0.3]]], np.float32))  # (1,1,2)
    f = hmm.forward(log_pi, log_A, log_obs)
    expect = np.logaddexp(np.log(0.25) + 0.1, np.log(0.75) - 0.3)
    assert abs(float(f.log_likelihood[0]) - expect) < 1e-5
    v = hmm.viterbi(log_pi, log_A, log_obs)
    assert v.states.shape == (1, 1)


def test_fuzz_random_configs_vs_bruteforce():
    """Seeded sweep of 20 random (K, T, time-varying, seed) configs vs
    the all-paths oracle — broader assurance than the fixed parametrize
    grid (catches shape-dependent indexing errors, e.g. off-by-one in
    which transition entry feeds step t)."""
    rng = np.random.default_rng(123)
    for trial in range(20):
        K = int(rng.integers(2, 5))
        T = int(rng.integers(2, 7))
        tv = bool(rng.integers(0, 2))
        log_pi, log_A, log_obs = _random_hmm(
            1, T, K, seed=int(rng.integers(0, 2**31)), time_varying=tv)
        fwd = hmm.forward(log_pi, jnp.asarray(log_A),
                          jnp.asarray(log_obs))
        vit = hmm.viterbi(log_pi, jnp.asarray(log_A),
                          jnp.asarray(log_obs))
        lA = log_A[0] if tv else np.broadcast_to(log_A, (T, K, K))
        ll, g, _, path, score = brute_force(
            log_pi.astype(np.float64), lA.astype(np.float64),
            log_obs[0].astype(np.float64))
        msg = f"trial {trial}: K={K} T={T} tv={tv}"
        assert abs(float(fwd.log_likelihood[0]) - ll) < 1e-4, msg
        np.testing.assert_array_equal(np.asarray(vit.states[0]), path,
                                      err_msg=msg)
        assert abs(float(vit.score[0]) - score) < 1e-4, msg
