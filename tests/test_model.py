"""Model-surface tests, including the reference smoke test's exact shapes
(reference: tests/smoke_test.py:16-40)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import ModelConfig, VAEHMM, make_model


def test_reference_smoke_shapes():
    """VAE_HMM(input_dim=5, hidden=8, K=3, hidden2=4, u_dim=2) on x:(1,5,16):
    mu and logvar must match x's shape."""
    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16)),
                    dtype=jnp.float32)
    logits = model.encode(params, x)
    q = jax.nn.softmax(logits, axis=1)
    mu, logvar = model.decode(params, q)
    assert mu.shape == x.shape
    assert logvar.shape == x.shape
    assert logits.shape == (1, 3, 16)


def test_prior_accepts_both_layouts():
    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    u_but = jnp.asarray(rng.normal(size=(2, 4, 9)), dtype=jnp.float32)
    log_pi, log_A = model.prior(params, u_but)  # (B, U, T)
    log_pi2, log_A2 = model.prior(params, jnp.transpose(u_but, (0, 2, 1)))
    assert log_A.shape == (2, 9, 3, 3)
    np.testing.assert_allclose(np.asarray(log_A), np.asarray(log_A2),
                               atol=1e-6)
    # rows of A normalize; pi normalizes
    np.testing.assert_allclose(np.exp(np.asarray(log_A)).sum(-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.exp(np.asarray(log_pi)).sum(), 1.0,
                               atol=1e-6)


def test_stationary_raises():
    """u_dim=None raises, matching reference VQ_VAE_HMM_fixed.py:50-51."""
    with pytest.raises(ValueError):
        VAEHMM(ModelConfig(u_dim=None))


def test_loss_requires_lengths():
    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 5, 8))
    u = jnp.zeros((1, 2, 8))
    with pytest.raises(ValueError):
        model.compute_loss(params, x, u, None)


def test_jit_and_grad_compose():
    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 12)), dtype=jnp.float32)
    u = jnp.asarray(rng.normal(size=(2, 2, 12)), dtype=jnp.float32)
    lengths = jnp.array([12, 7])

    fn = jax.jit(jax.value_and_grad(
        lambda p: model.compute_loss(p, x, u, lengths, 0.5)))
    loss, grads = fn(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # every parameter receives gradient signal
    assert all(np.any(np.asarray(g) != 0) for g in leaves)


def test_conv_impl_matmul_matches_conv():
    """The shifted-matmul conv lowering must match lax.conv exactly, and
    gradients must flow through it."""
    from vqvaehmm_tpu import ModelConfig, VAEHMM

    cfg_conv = ModelConfig(input_dim=5, hidden_dim=16, K=3, hidden_dim2=8,
                           u_dim=4, trans_hidden=16, conv_impl="conv")
    cfg_mm = ModelConfig(input_dim=5, hidden_dim=16, K=3, hidden_dim2=8,
                         u_dim=4, trans_hidden=16, conv_impl="matmul")
    m1, m2 = VAEHMM(cfg_conv), VAEHMM(cfg_mm)
    params = m1.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 25)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(3, 4, 25)).astype(np.float32))
    lengths = jnp.asarray(np.array([25, 12, 20], np.int32))

    with jax.default_matmul_precision("float32"):
        np.testing.assert_allclose(np.asarray(m1.encode(params, x)),
                                   np.asarray(m2.encode(params, x)),
                                   atol=2e-5)
        l1 = float(m1.compute_loss(params, x, u, lengths, 1.0))
        l2 = float(m2.compute_loss(params, x, u, lengths, 1.0))
        assert abs(l1 - l2) < 1e-4

        g1 = jax.grad(lambda p: m1.compute_loss(p, x, u, lengths, 1.0))(params)
        g2 = jax.grad(lambda p: m2.compute_loss(p, x, u, lengths, 1.0))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bf16_compute_dtype():
    """bf16-activation fast path: loss close to f32, finite f32 grads, and
    training still converges."""
    from vqvaehmm_tpu import ModelConfig, VAEHMM

    cfg16 = ModelConfig(input_dim=5, hidden_dim=16, K=3, hidden_dim2=8,
                        u_dim=4, trans_hidden=16,
                        compute_dtype="bfloat16",
                        matmul_precision="default")
    cfg32 = ModelConfig(input_dim=5, hidden_dim=16, K=3, hidden_dim2=8,
                        u_dim=4, trans_hidden=16)
    m16, m32 = VAEHMM(cfg16), VAEHMM(cfg32)
    params = m32.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 5, 32)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(4, 4, 32)).astype(np.float32))
    lens = jnp.asarray(np.full(4, 32, np.int32))

    l32 = float(m32.compute_loss(params, x, u, lens, 1.0))
    l16 = float(m16.compute_loss(params, x, u, lens, 1.0))
    assert abs(l32 - l16) / abs(l32) < 5e-3

    g = jax.grad(lambda p: m16.compute_loss(p, x, u, lens, 1.0))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # short training run converges in bf16 too
    from vqvaehmm_tpu import RandomChunkDataset, train_model
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences

    xs, us_, _ = synthetic_sequences(4, 100, seed=3)
    ds = RandomChunkDataset(xs, us_, min_len=16, max_len=48,
                            samples_per_epoch=48, seed=3)
    _, hist = train_model(m16, ds, num_epochs=6, lr=3e-3, batch_size=16,
                          log_fn=None)
    assert hist[-1] < hist[2]


def test_sample_generative_rollout():
    """model.sample: ancestral regime path from the input-conditioned
    prior + Gaussian decode — deterministic per key, mean path equals
    decoding the one-hot states, observation noise keyed separately."""
    model = make_model(5, 16, 3, 8, u_dim=4, trans_hidden=16)
    params = model.init(jax.random.PRNGKey(0))
    B, T = 4, 24
    u = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(B, 4, T)).astype(np.float32))

    states, x = model.sample(params, u, jax.random.PRNGKey(1))
    assert states.shape == (B, T) and states.dtype == jnp.int32
    assert x.shape == (B, 5, T)
    s = np.asarray(states)
    assert ((s >= 0) & (s < 3)).all()

    # deterministic per key; different key -> different draw
    states2, x2 = model.sample(params, u, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(states), np.asarray(states2))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    _, x3 = model.sample(params, u, jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(x), np.asarray(x3))

    # sample_obs=False returns exactly the decoder mean of the one-hot path
    states_m, mu = model.sample(params, u, jax.random.PRNGKey(1),
                                sample_obs=False)
    q = jax.nn.one_hot(states_m, 3, axis=1, dtype=jnp.float32)
    mu_direct, _ = model.decode(params, q)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_direct),
                               rtol=0, atol=0)
