"""Sequence-parallel HMM forward (T sharded over the 8-device virtual mesh)
vs the single-device scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.ops import hmm as hops
from vqvaehmm_tpu.parallel import create_mesh
from vqvaehmm_tpu.parallel.sharded_hmm import forward_sharded


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return create_mesh(8)


@pytest.mark.parametrize("B,T,K", [(3, 64, 3), (2, 80, 4), (1, 8, 2)])
def test_matches_unsharded(mesh, B, T, K):
    rng = np.random.default_rng(B * 100 + T)
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    log_A = np.log(rng.dirichlet(np.ones(K), size=(B, T, K))
                   ).astype(np.float32)
    log_obs = rng.normal(size=(B, T, K)).astype(np.float32)

    ref = hops.forward(jnp.asarray(log_pi), jnp.asarray(log_A),
                       jnp.asarray(log_obs))
    got = forward_sharded(jnp.asarray(log_pi), jnp.asarray(log_A),
                          jnp.asarray(log_obs), mesh)
    np.testing.assert_allclose(np.asarray(got.log_alpha),
                               np.asarray(ref.log_alpha), atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.log_likelihood),
                               np.asarray(ref.log_likelihood), atol=5e-5)


def test_stationary_broadcast(mesh):
    rng = np.random.default_rng(7)
    K = 3
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    log_A = np.log(rng.dirichlet(np.ones(K), size=K)).astype(np.float32)
    log_obs = rng.normal(size=(2, 40, K)).astype(np.float32)
    ref = hops.forward(jnp.asarray(log_pi), jnp.asarray(log_A),
                       jnp.asarray(log_obs))
    got = forward_sharded(jnp.asarray(log_pi), jnp.asarray(log_A),
                          jnp.asarray(log_obs), mesh)
    np.testing.assert_allclose(np.asarray(got.log_likelihood),
                               np.asarray(ref.log_likelihood), atol=5e-5)


def test_indivisible_t_raises(mesh):
    with pytest.raises(ValueError):
        forward_sharded(jnp.zeros(3), jnp.zeros((1, 10, 3, 3)),
                        jnp.zeros((1, 10, 3)), mesh)


def test_create_mesh_refuses_silent_truncation():
    """Requesting more devices than exist must raise — an '8-device mesh'
    quietly running on fewer devices invalidates scaling measurements."""
    import pytest

    from vqvaehmm_tpu.parallel import create_mesh

    with pytest.raises(ValueError, match="99-device mesh"):
        create_mesh(99)
