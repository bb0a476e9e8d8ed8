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


REF_PORTFOLIO = "/root/reference/models/portfolio.pt"
REF_IMPROVED = "/root/reference/models/portfolio_improved.pt"


@pytest.mark.skipif(not os.path.exists(REF_PORTFOLIO),
                    reason="reference portfolio.pt not present")
def test_regime_head_checkpoint_parity():
    """models/portfolio.pt loads into RegimePortfolioOptimizer and gives
    the torch module's exact weights (reference VQ_VAE_HMM_fixed.py:182-196
    in eval mode)."""
    import jax
    import jax.numpy as jnp
    import torch

    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               RegimePortfolioOptimizer)
    from vqvaehmm_tpu.utils import (load_torch_file,
                                    regime_head_params_from_state_dict)

    sd = load_torch_file(REF_PORTFOLIO)
    params = regime_head_params_from_state_dict(sd)
    hidden, K = sd["net.0.weight"].shape
    n_assets = sd["net.4.weight"].shape[0]
    head = RegimePortfolioOptimizer(HeadConfig(K=K, n_assets=n_assets,
                                               hidden_dim=hidden))
    rng = np.random.default_rng(3)
    q = rng.dirichlet(np.ones(K), size=8).astype(np.float32)

    with jax.default_matmul_precision("float32"):
        ours = np.asarray(head(params, jnp.asarray(q)))

    def lin(i, h):
        return h @ sd[f"net.{i}.weight"].T + sd[f"net.{i}.bias"]

    t = torch.from_numpy(q).numpy()  # plain numpy oracle
    h = np.maximum(lin(0, t), 0.0)
    h = np.maximum(lin(2, h), 0.0)
    logits = lin(4, h)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_IMPROVED),
                    reason="reference portfolio_improved.pt not present")
def test_improved_head_checkpoint_parity():
    """models/portfolio_improved.pt loads into ImprovedPortfolioOptimizer
    (the reference CLI's own workflow, inference.py:15-17) and matches the
    eval-mode torch forward (train_simple.py:50-59)."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               ImprovedPortfolioOptimizer)
    from vqvaehmm_tpu.utils import (improved_head_params_from_state_dict,
                                    load_torch_file)

    sd = load_torch_file(REF_IMPROVED)
    params = improved_head_params_from_state_dict(sd)
    K = len({k.split(".")[1] for k in sd})
    hidden = sd["regime_nets.0.0.weight"].shape[0]
    n_assets = sd["regime_nets.0.6.weight"].shape[0]
    head = ImprovedPortfolioOptimizer(HeadConfig(K=K, n_assets=n_assets,
                                                 hidden_dim=hidden))
    rng = np.random.default_rng(4)
    q = rng.dirichlet(np.ones(K), size=8).astype(np.float32)

    with jax.default_matmul_precision("float32"):
        ours = np.asarray(head(params, jnp.asarray(q)))

    weights = np.zeros((len(q), n_assets), np.float32)
    for r in range(K):
        h = np.maximum(q @ sd[f"regime_nets.{r}.0.weight"].T
                       + sd[f"regime_nets.{r}.0.bias"], 0.0)
        h = np.maximum(h @ sd[f"regime_nets.{r}.3.weight"].T
                       + sd[f"regime_nets.{r}.3.bias"], 0.0)
        logits = h @ sd[f"regime_nets.{r}.6.weight"].T \
            + sd[f"regime_nets.{r}.6.bias"]
        e = np.exp(logits - logits.max(-1, keepdims=True))
        weights += q[:, r:r + 1] * (e / e.sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, weights, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_IMPROVED),
                    reason="reference portfolio_improved.pt not present")
def test_cli_runs_on_reference_artifacts(tmp_path, capsys):
    """The reference user's switch-over path: our CLI consumes the
    reference's OWN shipped checkpoints (vae_hmm.pt + portfolio_improved
    .pt) directly and prints the allocation report."""
    import json

    from vqvaehmm_tpu.serve.cli import main as cli_main

    cfg = {"model": {"input_dim": 5, "hidden_dim": 64, "K": 3,
                     "hidden_dim2": 32, "u_dim": 4},
           "portfolio": {"n_assets": 10, "hidden_dim": 64}}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    x = np.random.default_rng(7).normal(size=(1, 5, 40)).astype(np.float32)
    data_path = str(tmp_path / "x.npy")
    np.save(data_path, x)

    cli_main(["--config", str(cfg_path), "--checkpoint", REF_CKPT,
              "--head-checkpoint", REF_IMPROVED, "--data", data_path])
    out = capsys.readouterr().out
    assert "Current regime:" in out and "Allocation:" in out


@pytest.mark.skipif(not os.path.exists(REF_PORTFOLIO),
                    reason="reference portfolio.pt not present")
def test_serving_loads_pt_head_checkpoint(tmp_path):
    """head_checkpoint_path pointing at a reference .pt head builds the
    matching family with the checkpoint's dims (not the config's)."""
    import json

    import jax

    from vqvaehmm_tpu.data.checkpoint import save_params_npz
    from vqvaehmm_tpu.models.portfolio import (ImprovedPortfolioOptimizer,
                                               RegimePortfolioOptimizer)
    from vqvaehmm_tpu.serve.app import InferenceModel
    import vqvaehmm_tpu as vt

    model = vt.make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    save_params_npz(str(tmp_path / "m.npz"),
                    model.init(jax.random.PRNGKey(0)))
    for ckpt, family, hidden in [(REF_PORTFOLIO,
                                  RegimePortfolioOptimizer, 64),
                                 (REF_IMPROVED,
                                  ImprovedPortfolioOptimizer, 128)]:
        if not os.path.exists(ckpt):
            continue
        cfg = {"model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                         "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
               "checkpoint_path": str(tmp_path / "m.npz"),
               "head_checkpoint_path": ckpt,
               "portfolio": {"n_assets": 4, "hidden_dim": 8}}
        p = tmp_path / f"cfg_{family.__name__}.json"
        p.write_text(json.dumps(cfg))
        m = InferenceModel(str(p))
        head, head_params = m._get_head()
        assert isinstance(head, family)
        assert head.cfg.hidden_dim == hidden
        assert head.cfg.n_assets == 10
        out = m.predict([[0.1] * 30] * 5)
        w = np.asarray(out["weights"], np.float64)
        assert w.shape == (10,)
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-4)


def test_head_state_dict_round_trips(tmp_path):
    """Our heads export reference-loadable state_dicts that round-trip,
    in memory and through an actual .pt file (save_head_torch_file
    dispatches the family from the params)."""
    import jax

    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               ImprovedPortfolioOptimizer,
                                               RegimePortfolioOptimizer)
    from vqvaehmm_tpu.utils import (head_params_from_state_dict,
                                    improved_head_params_to_state_dict,
                                    load_torch_file,
                                    regime_head_params_to_state_dict,
                                    save_head_torch_file)

    cfg = HeadConfig(K=3, n_assets=5, hidden_dim=8)
    for head, to_sd in [
            (RegimePortfolioOptimizer(cfg), regime_head_params_to_state_dict),
            (ImprovedPortfolioOptimizer(cfg),
             improved_head_params_to_state_dict)]:
        params = head.init(jax.random.PRNGKey(0))
        pt = str(tmp_path / f"{type(head).__name__}.pt")
        save_head_torch_file(params, pt)
        for back in (head_params_from_state_dict(to_sd(params)),
                     head_params_from_state_dict(load_torch_file(pt))):
            flat1 = jax.tree_util.tree_leaves_with_path(params)
            flat2 = dict(jax.tree_util.tree_leaves_with_path(back))
            assert len(flat1) == len(flat2)
            for path, leaf in flat1:
                np.testing.assert_array_equal(np.asarray(leaf),
                                              np.asarray(flat2[path]))


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
