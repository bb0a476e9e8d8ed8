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


def save_torch_file(params: Dict, path: str) -> None:
    """Write a VAEHMM param pytree as a reference-loadable torch .pt
    state_dict (lazy torch import) — the reverse of load_torch_file, so
    models trained here drop into the reference's servers/scripts
    (torch.load + VAE_HMM.load_state_dict, reference
    inference_api/app.py:44-47) unchanged."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32))
          for k, v in vae_hmm_params_to_state_dict(params).items()}
    torch.save(sd, path)
