"""Load reference PyTorch state_dicts into this framework's param pytrees.

SURVEY.md hard part 5: the reference ships trained checkpoints
(models/vae_hmm.pt etc.) saved as VAE_HMM state_dicts with names like
'encoder.conv1.weight'.  Because this framework stores parameters in torch
layouts already (Conv1d (O,I,W), Linear (out,in) — see ops/nn.py), the
mapping is a pure renaming, no transposes.

Torch is NOT imported here; callers pass a dict of numpy arrays (use
`state_dict_to_numpy` on a torch state_dict at the boundary, or load a
torch .pt file with `load_torch_file` which imports torch lazily).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

# reference state_dict key -> our pytree path
_VAE_HMM_MAP = {
    "encoder.conv1.weight": ("encoder", "conv1", "weight"),
    "encoder.conv1.bias": ("encoder", "conv1", "bias"),
    "encoder.conv2.weight": ("encoder", "conv2", "weight"),
    "encoder.conv2.bias": ("encoder", "conv2", "bias"),
    "encoder.to_logits.weight": ("encoder", "to_logits", "weight"),
    "encoder.to_logits.bias": ("encoder", "to_logits", "bias"),
    "prior.log_prior": ("prior", "log_prior"),
    "prior.transition_net.0.weight": ("prior", "fc1", "weight"),
    "prior.transition_net.0.bias": ("prior", "fc1", "bias"),
    "prior.transition_net.2.weight": ("prior", "fc2", "weight"),
    "prior.transition_net.2.bias": ("prior", "fc2", "bias"),
    "decoder.embeddings.weight": ("decoder", "embeddings", "weight"),
    "decoder.conv1.weight": ("decoder", "conv1", "weight"),
    "decoder.conv1.bias": ("decoder", "conv1", "bias"),
    "decoder.conv2.weight": ("decoder", "conv2", "weight"),
    "decoder.conv2.bias": ("decoder", "conv2", "bias"),
    "decoder.to_params.weight": ("decoder", "to_params", "weight"),
    "decoder.to_params.bias": ("decoder", "to_params", "bias"),
}


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """torch state_dict -> plain numpy dict (detaches at the boundary)."""
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in state_dict.items()}


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth state_dict file (lazy torch import)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return state_dict_to_numpy(state)


def vae_hmm_params_from_state_dict(numpy_sd: Dict[str, np.ndarray]) -> Dict:
    """Build a VAEHMM param pytree from a reference-named numpy dict."""
    params: Dict = {}
    missing = []
    for torch_key, path in _VAE_HMM_MAP.items():
        if torch_key not in numpy_sd:
            missing.append(torch_key)
            continue
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(numpy_sd[torch_key], jnp.float32)
    if missing:
        raise KeyError(f"state_dict missing expected keys: {missing}")
    extra = set(numpy_sd) - set(_VAE_HMM_MAP)
    if extra:
        raise KeyError(f"unrecognized state_dict keys: {sorted(extra)}")
    return params


def vae_hmm_params_to_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Export our pytree in reference naming (for round-trips / serving
    parity checks)."""
    out = {}
    for torch_key, path in _VAE_HMM_MAP.items():
        node = params
        for p in path:
            node = node[p]
        out[torch_key] = np.asarray(node)
    return out


# --- portfolio-head checkpoints ------------------------------------------
# The reference also ships trained downstream heads: models/portfolio.pt
# (RegimePortfolioOptimizer state_dict, nn.Sequential keys net.{0,2,4} —
# VQ_VAE_HMM_fixed.py:182-196, saved by train.py:91-92) and
# models/portfolio_improved.pt (ImprovedPortfolioOptimizer, per-regime
# nn.Sequential keys regime_nets.{i}.{0,3,6} — train_simple.py:38-48,
# loaded by inference.py:15-16).  Linear layout is torch-native here, so
# these are renames + a stack over the regime axis for the vmapped bank.

_REGIME_HEAD_LAYERS = {"0": "fc1", "2": "fc2", "4": "fc3"}
_IMPROVED_LAYERS = {"0": "fc1", "3": "fc2", "6": "fc3"}


def regime_head_params_from_state_dict(
        numpy_sd: Dict[str, np.ndarray]) -> Dict:
    """RegimePortfolioOptimizer pytree from a reference `net.{0,2,4}`
    state_dict (models/portfolio.pt)."""
    expected = {f"net.{i}.{p}" for i in _REGIME_HEAD_LAYERS
                for p in ("weight", "bias")}
    _check_keys(numpy_sd, expected)
    return {fc: {p: jnp.asarray(numpy_sd[f"net.{i}.{p}"], jnp.float32)
                 for p in ("weight", "bias")}
            for i, fc in _REGIME_HEAD_LAYERS.items()}


def regime_head_params_to_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of regime_head_params_from_state_dict (reference-loadable)."""
    return {f"net.{i}.{p}": np.asarray(params[fc][p], np.float32)
            for i, fc in _REGIME_HEAD_LAYERS.items()
            for p in ("weight", "bias")}


def improved_head_params_from_state_dict(
        numpy_sd: Dict[str, np.ndarray]) -> Dict:
    """ImprovedPortfolioOptimizer pytree from a reference
    `regime_nets.{i}.{0,3,6}` state_dict (models/portfolio_improved.pt).
    Per-regime nets are stacked on a leading K axis to match the vmapped
    expert bank (models/portfolio.py ImprovedPortfolioOptimizer.init)."""
    regimes = sorted({int(k.split(".")[1]) for k in numpy_sd
                      if k.startswith("regime_nets.")})
    if regimes != list(range(len(regimes))) or not regimes:
        raise KeyError(f"malformed regime_nets indices: {regimes}")
    expected = {f"regime_nets.{r}.{i}.{p}" for r in regimes
                for i in _IMPROVED_LAYERS for p in ("weight", "bias")}
    _check_keys(numpy_sd, expected)
    return {fc: {p: jnp.asarray(np.stack(
                    [numpy_sd[f"regime_nets.{r}.{i}.{p}"] for r in regimes]),
                    jnp.float32)
                 for p in ("weight", "bias")}
            for i, fc in _IMPROVED_LAYERS.items()}


def improved_head_params_to_state_dict(
        params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of improved_head_params_from_state_dict: unstack the regime
    axis back into reference `regime_nets.{i}` naming."""
    K = int(np.asarray(params["fc1"]["weight"]).shape[0])
    return {f"regime_nets.{r}.{i}.{p}":
            np.asarray(params[fc][p][r], np.float32)
            for r in range(K)
            for i, fc in _IMPROVED_LAYERS.items()
            for p in ("weight", "bias")}


def head_params_from_state_dict(numpy_sd: Dict[str, np.ndarray]) -> Dict:
    """Auto-detect the head family from state_dict naming: `regime_nets.*`
    -> ImprovedPortfolioOptimizer, `net.*` -> RegimePortfolioOptimizer."""
    if any(k.startswith("regime_nets.") for k in numpy_sd):
        return improved_head_params_from_state_dict(numpy_sd)
    if any(k.startswith("net.") for k in numpy_sd):
        return regime_head_params_from_state_dict(numpy_sd)
    raise KeyError("state_dict matches no known portfolio head family "
                   f"(keys: {sorted(numpy_sd)[:6]}...)")


def _check_keys(numpy_sd: Dict[str, np.ndarray], expected) -> None:
    missing = sorted(expected - set(numpy_sd))
    extra = sorted(set(numpy_sd) - expected)
    if missing:
        raise KeyError(f"state_dict missing expected keys: {missing}")
    if extra:
        raise KeyError(f"unrecognized state_dict keys: {extra}")


def save_torch_file(params: Dict, path: str) -> None:
    """Write a VAEHMM param pytree as a reference-loadable torch .pt
    state_dict (lazy torch import) — the reverse of load_torch_file, so
    models trained here drop into the reference's servers/scripts
    (torch.load + VAE_HMM.load_state_dict, reference
    inference_api/app.py:44-47) unchanged."""
    _save_sd(vae_hmm_params_to_state_dict(params), path)


def save_head_torch_file(params: Dict, path: str) -> None:
    """Write a portfolio-head pytree as a reference-loadable .pt
    state_dict, family detected from the params (a 3-D fc1 weight is the
    stacked Improved bank) — the head counterpart of save_torch_file
    (reference save targets: train.py:91-92, train_simple.py:194-195)."""
    if np.asarray(params["fc1"]["weight"]).ndim == 3:
        _save_sd(improved_head_params_to_state_dict(params), path)
    else:
        _save_sd(regime_head_params_to_state_dict(params), path)


def _save_sd(sd: Dict[str, np.ndarray], path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.array(v, dtype=np.float32))
                for k, v in sd.items()}, path)
