"""Hybrid exact inference on the VAE-HMM: smoothing + Viterbi over the
Prior's transitions with encoder evidence — the capability the reference
lacks (argmax-of-mean-field only)."""

import jax
import jax.numpy as jnp
import numpy as np

import vqvaehmm_tpu as vt
from vqvaehmm_tpu.data.synthetic import synthetic_sequences


def _trained(seed=0):
    xs, us, zs = synthetic_sequences(6, 150, seed=seed, stickiness=0.97)
    ds = vt.RandomChunkDataset(xs, us, min_len=20, max_len=64,
                               samples_per_epoch=96, seed=seed)
    model = vt.make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    state, _ = vt.train_model(model, ds, num_epochs=10, lr=2e-3,
                              batch_size=32, log_fn=None)
    return model, state.params, xs, us, zs


def test_smoothed_posterior_properties():
    model, params, xs, us, zs = _trained()
    x = jnp.asarray(xs[:3])
    u = jnp.asarray(us[:3])
    gamma = model.smoothed_posterior(params, x, u)
    assert gamma.shape == (3, 3, 150)
    np.testing.assert_allclose(np.asarray(gamma).sum(axis=1), 1.0,
                               atol=1e-4)

    # smoothing with sticky learned dynamics must not flicker MORE than
    # the raw mean-field posterior
    q = model.posterior(params, x)
    flips_q = int((np.asarray(q).argmax(1)[:, 1:]
                   != np.asarray(q).argmax(1)[:, :-1]).sum())
    flips_g = int((np.asarray(gamma).argmax(1)[:, 1:]
                   != np.asarray(gamma).argmax(1)[:, :-1]).sum())
    assert flips_g <= flips_q + 2


def test_viterbi_decode_vs_reference_argmax():
    """With controlled sticky transitions, exact Viterbi must switch
    regimes no more often than the reference's per-step argmax decode
    (whether it helps with *learned* dynamics depends on what the prior
    learned, so the dynamics are pinned here)."""
    model, params, xs, us, zs = _trained(seed=1)
    x = jnp.asarray(xs[:4])
    u = jnp.asarray(us[:4])

    # Pin the prior to constant sticky transitions: fc2 weight 0, bias =
    # strong-diagonal K*K logits.
    K = 3
    diag_logits = (np.full((K, K), 0.0) + np.eye(K) * 4.0).reshape(-1)
    sticky = jax.tree_util.tree_map(lambda a: a, params)
    sticky["prior"]["fc2"]["weight"] = jnp.zeros_like(
        params["prior"]["fc2"]["weight"])
    sticky["prior"]["fc2"]["bias"] = jnp.asarray(diag_logits, jnp.float32)

    path = model.viterbi_decode(sticky, x, u)
    assert path.shape == (4, 150)
    assert set(np.unique(np.asarray(path))) <= {0, 1, 2}

    q = model.posterior(sticky, x)
    hard = np.asarray(q).argmax(1)
    flips_hard = int((hard[:, 1:] != hard[:, :-1]).sum())
    p_np = np.asarray(path)
    flips_vit = int((p_np[:, 1:] != p_np[:, :-1]).sum())
    assert flips_vit <= flips_hard

    # pallas variant agrees with scan variant
    path_p = model.viterbi_decode(sticky, x, u, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(path_p), p_np)


def test_ragged_smoothing():
    model, params, xs, us, zs = _trained(seed=2)
    x = jnp.asarray(xs[:2, :, :64])
    u = jnp.asarray(us[:2, :, :64])
    lengths = jnp.asarray(np.array([64, 40], np.int32))
    gamma = model.smoothed_posterior(params, x, u, lengths)
    np.testing.assert_allclose(np.asarray(gamma).sum(axis=1), 1.0,
                               atol=1e-4)
    path = model.viterbi_decode(params, x, u, lengths)
    assert path.shape == (2, 64)


def test_filtered_posterior_is_causal():
    """p(z_t | x_{1:t}): changing FUTURE observations must not change the
    filtered posterior at earlier steps (while smoothing does)."""
    model, params, xs, us, zs = _trained(seed=3)
    x = jnp.asarray(xs[:2, :, :60])
    u = jnp.asarray(us[:2, :, :60])

    f1 = np.asarray(model.filtered_posterior(params, x, u))
    s1 = np.asarray(model.smoothed_posterior(params, x, u))
    np.testing.assert_allclose(f1.sum(axis=1), 1.0, atol=1e-4)

    # perturb the tail beyond t=40
    x2 = np.asarray(x).copy()
    x2[:, :, 45:] += 3.0
    u2 = np.asarray(u).copy()
    u2[:, :, 45:] -= 2.0
    f2 = np.asarray(model.filtered_posterior(params, jnp.asarray(x2),
                                             jnp.asarray(u2)))
    s2 = np.asarray(model.smoothed_posterior(params, jnp.asarray(x2),
                                             jnp.asarray(u2)))

    # causal: earlier steps unaffected (conv receptive field reaches back
    # 2 steps, so compare strictly before t=43)
    np.testing.assert_allclose(f1[:, :, :43], f2[:, :, :43], atol=1e-5)

    # smoothing DOES propagate future evidence backward — measurable only
    # under informative dynamics, so pin sticky transitions (with learned
    # near-uniform transitions the backward signal decays to ~1e-6 within
    # a few steps, which is itself correct behaviour).
    K = 3
    sticky = jax.tree_util.tree_map(lambda a: a, params)
    sticky["prior"]["fc2"]["weight"] = jnp.zeros_like(
        params["prior"]["fc2"]["weight"])
    sticky["prior"]["fc2"]["bias"] = jnp.asarray(
        (np.eye(K) * 4.0).reshape(-1), jnp.float32)
    s1s = np.asarray(model.smoothed_posterior(sticky, x, u))
    s2s = np.asarray(model.smoothed_posterior(sticky, jnp.asarray(x2),
                                              jnp.asarray(u2)))
    f1s = np.asarray(model.filtered_posterior(sticky, x, u))
    f2s = np.asarray(model.filtered_posterior(sticky, jnp.asarray(x2),
                                              jnp.asarray(u2)))
    np.testing.assert_allclose(f1s[:, :, :43], f2s[:, :, :43], atol=1e-5)
    assert np.abs(s1s[:, :, :43] - s2s[:, :, :43]).max() > 1e-3
