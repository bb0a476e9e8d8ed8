"""Independent reference oracles for parity testing.

Two oracles implement the documented VAE-HMM math (math.md / reference
VQ_VAE_HMM_fixed.py:106-137) without sharing any code with the framework
under test:

* `torch_elbo` — a functional PyTorch implementation (torch.nn.functional
  calls over the same parameter arrays) used to pin the <=1e-4 parity bar
  against real torch conv/softmax semantics.
* `numpy_forward_backward` etc. live in test_hmm.py (brute-force chain
  enumeration).

Parameters are passed as the framework's pytree (torch layouts: Conv1d
(O,I,W), Linear (out,in)), converted to torch tensors here.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(a) -> torch.Tensor:
    # np.array (copy) rather than asarray: jax arrays convert to
    # NON-writable numpy views, and torch.from_numpy warns on those
    return torch.from_numpy(np.array(a, dtype=np.float32))


def torch_encode(params, x: torch.Tensor) -> torch.Tensor:
    p = params["encoder"]
    h = F.relu(F.conv1d(x, _t(p["conv1"]["weight"]), _t(p["conv1"]["bias"]),
                        padding=1))
    h = F.relu(F.conv1d(h, _t(p["conv2"]["weight"]), _t(p["conv2"]["bias"]),
                        padding=1))
    return F.conv1d(h, _t(p["to_logits"]["weight"]),
                    _t(p["to_logits"]["bias"]))


def torch_prior(params, u: torch.Tensor, K: int, u_dim: int):
    p = params["prior"]
    if u.dim() == 3 and u.shape[1] == u_dim:
        u = u.permute(0, 2, 1)
    B, T, _ = u.shape
    h = F.relu(F.linear(u.reshape(B * T, -1), _t(p["fc1"]["weight"]),
                        _t(p["fc1"]["bias"])))
    logits = F.linear(h, _t(p["fc2"]["weight"]), _t(p["fc2"]["bias"]))
    log_A = F.log_softmax(logits.view(B, T, K, K), dim=-1)
    log_pi = F.log_softmax(_t(p["log_prior"]), dim=-1)
    return log_pi, log_A


def torch_decode(params, q: torch.Tensor):
    p = params["decoder"]
    E = _t(p["embeddings"]["weight"])
    e = torch.matmul(q.permute(0, 2, 1), E).permute(0, 2, 1)
    h = F.relu(F.conv1d(e, _t(p["conv1"]["weight"]), _t(p["conv1"]["bias"]),
                        padding=1))
    h = F.relu(F.conv1d(h, _t(p["conv2"]["weight"]), _t(p["conv2"]["bias"]),
                        padding=1))
    out = F.conv1d(h, _t(p["to_params"]["weight"]), _t(p["to_params"]["bias"]))
    mid = out.shape[1] // 2
    return out[:, :mid, :], out[:, mid:, :]


def torch_elbo(params, x, u, lengths, beta: float, K: int,
               u_dim: int) -> float:
    """Full masked negative ELBO with the reference's exact normalizations."""
    x = _t(x)
    u = _t(u)
    lengths = torch.from_numpy(np.array(lengths, dtype=np.int64))
    B, C, T = x.shape

    mask = torch.arange(T)[None, :] < lengths[:, None]
    log_pi, log_A = torch_prior(params, u, K, u_dim)
    logits = torch_encode(params, x)
    q = F.softmax(logits, dim=1)
    mu, logvar = torch_decode(params, q)

    var = logvar.exp().clamp(min=1e-8)
    nll = 0.5 * (torch.log(2 * math.pi * var) + (mu - x) ** 2 / var)
    recon = (nll * mask.unsqueeze(1).float()).sum() / \
        (mask.sum() * C).clamp(min=1.0)

    init_term = (q[:, :, 0] * log_pi.unsqueeze(0)).sum(dim=1)
    q_prev = q[:, :, :-1].permute(0, 2, 1).unsqueeze(-1)
    q_next = q[:, :, 1:].permute(0, 2, 1).unsqueeze(-2)
    trans = (q_prev * q_next * log_A[:, 1:]).sum(dim=(2, 3))
    tmask = (mask[:, 1:] & mask[:, :-1]).float()
    prior_loss = -(init_term + (trans * tmask).sum(dim=1)).mean()

    entropy = -(q * F.log_softmax(logits, dim=1)).sum(dim=1)
    entropy = (entropy * mask.float()).sum() / B

    return float(recon + beta * (prior_loss - entropy))


def jax_params_to_numpy(params):
    """Pull a JAX param pytree to host numpy (nested dicts preserved)."""
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a), params)
