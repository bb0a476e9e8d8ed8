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
