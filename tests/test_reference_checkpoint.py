"""Interop with the reference's shipped trained checkpoints.

BASELINE.json requires that the walk-forward backtester consume *identical*
regime sequences when our framework loads the reference's weights.  These
tests load models/vae_hmm.pt from the reference tree (skipped when absent),
map it into our pytree, and compare posteriors / ELBO against the
functional-torch oracle running the same weights.
"""

import os

import numpy as np
import pytest

REF_CKPT = "/root/reference/models/vae_hmm.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_CKPT),
                                reason="reference checkpoint not present")


@pytest.fixture(scope="module")
def loaded():
    import jax

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.utils import (load_torch_file,
                                    vae_hmm_params_from_state_dict)

    sd = load_torch_file(REF_CKPT)
    params = vae_hmm_params_from_state_dict(sd)
    # infer dims from the weights
    hidden, input_dim, _ = sd["encoder.conv1.weight"].shape
    K = sd["encoder.to_logits.weight"].shape[0]
    hidden2 = sd["encoder.conv2.weight"].shape[0]
    trans_hidden, u_dim = sd["prior.transition_net.0.weight"].shape
    model = make_model(input_dim, hidden, K, hidden2, u_dim=u_dim,
                       trans_hidden=trans_hidden)
    return model, params, sd


def test_reference_weights_load(loaded):
    model, params, sd = loaded
    assert params["encoder"]["conv1"]["weight"].shape == \
        sd["encoder.conv1.weight"].shape


def test_identical_regime_sequences(loaded):
    """argmax regime decode from our encode == torch decode, elementwise."""
    import jax
    import jax.numpy as jnp

    from tests.oracles import torch_encode
    import torch
    import torch.nn.functional as F

    model, params, sd = loaded
    np_params = jax.tree_util.tree_map(np.asarray, params)
    C = params["encoder"]["conv1"]["weight"].shape[1]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, C, 60)).astype(np.float32)

    with jax.default_matmul_precision("float32"):
        q_ours = np.asarray(model.posterior(params, jnp.asarray(x)))
    logits_t = torch_encode(np_params, torch.from_numpy(x))
    q_torch = F.softmax(logits_t, dim=1).numpy()

    np.testing.assert_allclose(q_ours, q_torch, atol=1e-5)
    np.testing.assert_array_equal(q_ours.argmax(axis=1),
                                  q_torch.argmax(axis=1))


def test_elbo_parity_on_reference_weights(loaded):
    import jax
    import jax.numpy as jnp

    from tests.oracles import jax_params_to_numpy, torch_elbo

    model, params, sd = loaded
    cfg = model.cfg
    rng = np.random.default_rng(1)
    B, T = 3, 50
    x = rng.normal(size=(B, cfg.input_dim, T)).astype(np.float32)
    u = rng.normal(size=(B, cfg.u_dim, T)).astype(np.float32)
    lengths = np.array([T, 30, 44], np.int32)

    with jax.default_matmul_precision("float32"):
        ours = float(model.compute_loss(params, jnp.asarray(x),
                                        jnp.asarray(u),
                                        jnp.asarray(lengths), 1.0))
    ref = torch_elbo(jax_params_to_numpy(params), x, u, lengths, 1.0,
                     K=cfg.K, u_dim=cfg.u_dim)
    assert abs(ours - ref) <= 1e-4 * max(1.0, abs(ref))
