"""The two-stage training script runs end-to-end and saves all four
checkpoints (reference workflow: train.py:1-119 — stage-1 VAE-HMM, then a
portfolio head on frozen posteriors, save_models train.py:87-93).

One in-process run at minimal epochs; the .pt twins must load in torch
and carry the expected state_dict families."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def test_train_script_end_to_end(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("train_script",
                                                  SCRIPTS / "train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setattr(sys, "argv",
                        ["train.py", "--synthetic", "--epochs", "2",
                         "--port-epochs", "2", "--outdir", str(tmp_path)])
    mod.main()

    for name in ("vae_hmm.npz", "portfolio.npz", "vae_hmm.pt",
                 "portfolio.pt"):
        assert (tmp_path / name).exists(), name

    import torch

    vae_sd = torch.load(tmp_path / "vae_hmm.pt", weights_only=True)
    head_sd = torch.load(tmp_path / "portfolio.pt", weights_only=True)
    # reference VAE_HMM state_dict prefixes (VQ_VAE_HMM_fixed.py:31-90)
    assert any(k.startswith("encoder.") for k in vae_sd)
    assert any(k.startswith("prior.") for k in vae_sd)
    assert any(k.startswith("decoder.") for k in vae_sd)
    # RegimePortfolioOptimizer exports the reference's net.* Sequential
    # layout (portfolio_optimizer.py RegimePortfolioOptimizer)
    assert {"net.0.weight", "net.0.bias"} <= set(head_sd)

    # the saved head round-trips into the framework's pytree
    from vqvaehmm_tpu.utils import (head_params_from_state_dict,
                                    load_torch_file)

    back = head_params_from_state_dict(load_torch_file(tmp_path /
                                                       "portfolio.pt"))
    assert np.asarray(back["fc1"]["weight"]).ndim == 2
