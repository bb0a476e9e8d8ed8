"""Fully-fused end-to-end Viterbi decode (ops/pallas_decode.py) vs the
scan path, including the VAEHMM.viterbi_decode dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.ops.pallas_decode import fused_viterbi_states, supported


@pytest.mark.parametrize("B,C,T,U,K", [(16, 5, 48, 4, 3), (8, 3, 40, 5, 4)])
def test_fused_decode_matches_scan(B, C, T, U, K):
    model = make_model(C, 32, K, 16, u_dim=U, trans_hidden=32)
    params = model.init(jax.random.PRNGKey(K))
    rng = np.random.default_rng(B)
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, U, T)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=B)
                          .astype(np.int32))
    ref = np.asarray(model.viterbi_decode(params, x, u, lengths,
                                          use_pallas=False))
    got = np.asarray(fused_viterbi_states(model, params, x, u, lengths,
                                          interpret=True))
    L = np.asarray(lengths)
    for b in range(B):
        np.testing.assert_array_equal(got[b, :L[b]], ref[b, :L[b]])
    # dispatch path: use_pallas=True on CPU routes through the fused
    # kernel in interpret mode and must agree too
    via = np.asarray(model.viterbi_decode(params, x, u, lengths,
                                          use_pallas=True))
    for b in range(B):
        np.testing.assert_array_equal(via[b, :L[b]], ref[b, :L[b]])


def test_fused_decode_btu_layout_and_no_lengths():
    model = make_model(5, 16, 3, 8, u_dim=4, trans_hidden=16)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(8, 5, 32)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(8, 32, 4)).astype(np.float32))  # (B,T,U)
    ref = np.asarray(model.viterbi_decode(params, x, u, use_pallas=False))
    got = np.asarray(fused_viterbi_states(model, params, x, u,
                                          interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_supported_predicate():
    assert supported(64, 200)
    assert not supported(64, 50)   # T % 8 != 0
    assert not supported(3, 200)   # no qualifying block divides B


def test_fused_evidence_matches_xla_paths():
    """fused_evidence == (model.prior, model._hmm_evidence) and the
    smoothed/filtered posteriors agree through it."""
    from vqvaehmm_tpu.ops.pallas_decode import fused_evidence

    model = make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    B, T = 16, 48
    x = jnp.asarray(rng.normal(size=(B, 5, T)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, 4, T)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=B)
                          .astype(np.int32))

    ref_pi, ref_A = model.prior(params, u)
    ref_obs = model._hmm_evidence(params, x, lengths)
    pi, A, obs = fused_evidence(model, params, x, u, lengths,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(ref_pi),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(A), np.asarray(ref_A), atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(ref_obs),
                               atol=1e-5)

    L = np.asarray(lengths)
    for fn in (model.smoothed_posterior, model.filtered_posterior):
        a = np.asarray(fn(params, x, u, lengths, use_pallas=False))
        b = np.asarray(fn(params, x, u, lengths, use_pallas=True))
        for i in range(B):
            np.testing.assert_allclose(b[i, :, :L[i]], a[i, :, :L[i]],
                                       atol=2e-5)
