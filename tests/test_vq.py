"""Vector quantization: XLA path vs brute force, Pallas kernel parity
(interpret mode on CPU), straight-through gradients, EMA updates, and the
full VQVAE-HMM model (pseudocode.txt capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.models import VQVAEConfig, VQVAEHMM
from vqvaehmm_tpu.ops.vq import (ema_init, ema_update, quantize_st,
                                 vq_lookup, vq_pallas)


def test_vq_lookup_matches_bruteforce(rng):
    N, D, K = 64, 8, 5
    z = rng.normal(size=(N, D)).astype(np.float32)
    cb = rng.normal(size=(K, D)).astype(np.float32)
    zq, idx = vq_lookup(jnp.asarray(z), jnp.asarray(cb))
    dists = ((z[:, None, :] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), dists.argmin(-1))
    np.testing.assert_allclose(np.asarray(zq), cb[dists.argmin(-1)],
                               atol=1e-6)


def test_vq_pallas_matches_xla(rng):
    N, D, K = 300, 16, 8  # N not a multiple of block => tests padding
    z = rng.normal(size=(N, D)).astype(np.float32)
    cb = rng.normal(size=(K, D)).astype(np.float32)
    zq_ref, idx_ref = vq_lookup(jnp.asarray(z), jnp.asarray(cb))
    zq_pl, idx_pl = vq_pallas(jnp.asarray(z), jnp.asarray(cb),
                              block_rows=128)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq_pl), np.asarray(zq_ref),
                               atol=1e-5)


def test_straight_through_gradient(rng):
    """d loss/d z_e must flow as if quantization were identity."""
    z = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    def f(z):
        res = quantize_st(z, cb)
        return (res.quantized ** 2).sum()

    g = jax.grad(f)(z)
    zq, _ = vq_lookup(z, cb)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(zq), atol=1e-5)


def test_vq_losses_zero_when_on_codebook(rng):
    cb = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    z = cb[jnp.asarray([0, 2, 1, 3, 0])]
    res = quantize_st(z, cb)
    assert float(res.commitment_loss) < 1e-10
    assert float(res.codebook_loss) < 1e-10


def test_ema_update_moves_codes_toward_data(rng):
    K, D = 3, 4
    cb = jnp.asarray(np.zeros((K, D), np.float32))
    target = rng.normal(size=(K, D)).astype(np.float32) * 2
    state = ema_init(cb)
    codebook = cb
    for i in range(200):
        idx = jnp.asarray(np.repeat(np.arange(K), 16))
        z = jnp.asarray(target[np.asarray(idx)]
                        + 0.05 * rng.normal(size=(K * 16, D)).astype(np.float32))
        state, codebook = ema_update(state, codebook, z, idx, decay=0.9)
    np.testing.assert_allclose(np.asarray(codebook), target, atol=0.1)


def test_vqvae_hmm_end_to_end(rng):
    cfg = VQVAEConfig(input_dim=5, hidden_dim=16, hidden_dim2=8,
                      num_codes=4, latent_dim=8)
    model = VQVAEHMM(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(3, 5, 32)).astype(np.float32))
    lengths = jnp.asarray(np.array([32, 20, 28], np.int32))

    loss = model.compute_loss(params, x, lengths)
    assert np.isfinite(float(loss.total))
    assert float(loss.recon) >= 0
    assert float(loss.commitment) >= 0

    codes = model.codes(params, x)
    assert codes.shape == (3, 32)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 4).all()

    # gradients flow (encoder + codebook via ST + codebook loss)
    g = jax.grad(lambda p: model.compute_loss(p, x, lengths).total)(params)
    enc_leaves = jax.tree_util.tree_leaves(g["encoder"])
    assert all(np.isfinite(np.asarray(l)).all() for l in enc_leaves)
    assert any(np.any(np.asarray(l) != 0) for l in enc_leaves)
    assert np.any(np.asarray(g["codebook"]) != 0)

    # EM HMM over codes + sampling round-trip
    # lengths routed through: EM must not count padding-derived codes
    em = model.fit_hmm(params, x, lengths=lengths, n_iters=10)
    lls = np.asarray(em.log_likelihoods)
    assert np.isfinite(lls).all()
    out = model.sample(params, em.model, jax.random.PRNGKey(1),
                       seq_len=16, batch=2)
    assert out.shape == (2, 5, 16)


def test_quantize_st_pallas_path(rng):
    """quantize_st(use_pallas=True) matches the XLA path (interpret mode)."""
    z = jnp.asarray(rng.normal(size=(6, 10, 8)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    a = quantize_st(z, cb, use_pallas=False)
    b = quantize_st(z, cb, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(a.indices),
                                  np.asarray(b.indices))
    np.testing.assert_allclose(np.asarray(a.quantized),
                               np.asarray(b.quantized), atol=1e-6)
    assert abs(float(a.commitment_loss) - float(b.commitment_loss)) < 1e-6
