"""ELBO parity vs a functional-torch oracle, plus invariance properties.

Acceptance bar: agreement <=1e-4 with the reference loss semantics
(BASELINE.json; reference loss at VQ_VAE_HMM_fixed.py:106-137).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import make_model
from tests.oracles import jax_params_to_numpy, torch_elbo


def _setup(B=4, C=5, T=37, K=3, U=4, seed=0):
    model = make_model(C, 16, K, 8, u_dim=U, trans_hidden=24)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, C, T)).astype(np.float32)
    u = rng.normal(size=(B, U, T)).astype(np.float32)
    lengths = rng.integers(5, T + 1, size=B).astype(np.int32)
    lengths[0] = T  # at least one full-length row
    return model, params, x, u, lengths


@pytest.mark.parametrize("beta", [0.0, 0.37, 1.0])
def test_elbo_matches_torch_oracle(beta):
    model, params, x, u, lengths = _setup()
    with jax.default_matmul_precision("float32"):
        ours = float(model.compute_loss(params, jnp.asarray(x),
                                        jnp.asarray(u),
                                        jnp.asarray(lengths), beta))
    ref = torch_elbo(jax_params_to_numpy(params), x, u, lengths, beta,
                     K=3, u_dim=4)
    assert abs(ours - ref) <= 1e-4 * max(1.0, abs(ref))


def test_padding_invariance():
    """Padding beyond the batch max must not change the loss — this is what
    makes static-shape batching exact, not approximate."""
    model, params, x, u, lengths = _setup(T=30)
    pad = 34
    xp = np.zeros((x.shape[0], x.shape[1], x.shape[2] + pad), np.float32)
    up = np.zeros((u.shape[0], u.shape[1], u.shape[2] + pad), np.float32)
    xp[:, :, :x.shape[2]] = x
    up[:, :, :u.shape[2]] = u
    with jax.default_matmul_precision("float32"):
        a = float(model.compute_loss(params, jnp.asarray(x), jnp.asarray(u),
                                     jnp.asarray(lengths), 0.7))
        b = float(model.compute_loss(params, jnp.asarray(xp), jnp.asarray(up),
                                     jnp.asarray(lengths), 0.7))
    assert abs(a - b) <= 1e-5 * max(1.0, abs(a))


def test_masked_tail_content_invariance():
    """Garbage in the padded tail must be fully masked out of the loss."""
    model, params, x, u, lengths = _setup(T=30)
    lengths = np.full_like(lengths, 20)
    x2 = x.copy()
    u2 = u.copy()
    x2[:, :, 21:] = 99.0  # t=20 left clean: conv k=3 reads one step past L-1
    u2[:, :, 21:] = -99.0
    with jax.default_matmul_precision("float32"):
        a = float(model.compute_loss(params, jnp.asarray(x), jnp.asarray(u),
                                     jnp.asarray(lengths), 1.0))
        b = float(model.compute_loss(params, jnp.asarray(x2), jnp.asarray(u2),
                                     jnp.asarray(lengths), 1.0))
    assert abs(a - b) <= 1e-4 * max(1.0, abs(a))


def test_forward_matches_torch_oracle():
    from tests.oracles import torch_decode, torch_encode, _t
    import torch
    import torch.nn.functional as F

    model, params, x, u, lengths = _setup()
    with jax.default_matmul_precision("float32"):
        (mu, logvar), q = model(params, jnp.asarray(x))
    np_params = jax_params_to_numpy(params)
    logits_t = torch_encode(np_params, _t(x))
    q_t = F.softmax(logits_t, dim=1)
    mu_t, logvar_t = torch_decode(np_params, q_t)
    np.testing.assert_allclose(np.asarray(q), q_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), logvar_t.numpy(), atol=1e-4)


@pytest.mark.parametrize("seed,B,C,T,K,U,hidden,hidden2,beta", [
    (10, 2, 3, 16, 2, 2, 8, 4, 0.5),
    (11, 8, 7, 64, 4, 3, 24, 12, 1.0),
    (12, 1, 5, 200, 3, 4, 64, 32, 0.25),   # reference benchmark shape
    (13, 5, 4, 33, 5, 6, 16, 8, 0.9),
    (14, 3, 6, 48, 2, 1, 12, 6, 0.1),
])
def test_elbo_parity_fuzz(seed, B, C, T, K, U, hidden, hidden2, beta):
    """Parity sweep over random architectures/shapes: the <=1e-4 agreement
    must hold across the config space, not just the default shapes."""
    model = make_model(C, hidden, K, hidden2, u_dim=U,
                       trans_hidden=max(8, 4 * U))
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=rng.uniform(0.5, 2.0),
                   size=(B, C, T)).astype(np.float32)
    u = rng.normal(size=(B, U, T)).astype(np.float32)
    lengths = rng.integers(max(2, T // 4), T + 1, size=B).astype(np.int32)
    lengths[0] = T
    with jax.default_matmul_precision("float32"):
        ours = float(model.compute_loss(params, jnp.asarray(x),
                                        jnp.asarray(u),
                                        jnp.asarray(lengths), beta))
    ref = torch_elbo(jax_params_to_numpy(params), x, u, lengths, beta,
                     K=K, u_dim=U)
    assert abs(ours - ref) <= 1e-4 * max(1.0, abs(ref)), (ours, ref)
