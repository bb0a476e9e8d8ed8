"""True VQ-VAE + HMM over discrete codes — the reference's design sketch
(pseudocode.txt:1-32) implemented for real.

The reference repo is named VQ-VAE-HMM but its shipped model is a mean-field
VAE with a soft codebook (SURVEY.md section 2.1); actual vector quantization
exists only as pseudocode.  This module implements that sketch TPU-first:

  z_e = encoder(x)                       # continuous codes per timestep
  z_q, idx = quantize(z_e, codebook)     # fused L2+argmin (ops/vq.py)
  z_q_st = z_e + sg(z_q - z_e)           # straight-through
  x_hat = decoder(z_q_st)
  loss = MSE + commit + codebook         # pseudocode.txt:16-19
  hmm = fit_categorical_em(all indices)  # pseudocode.txt:26-27
  sample: hmm.sample -> codebook.lookup -> decoder   # pseudocode.txt:29-32
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.masking import length_mask
from ..ops import nn as ops
from ..ops.vq import VQResult, quantize_st
from .hmm import EMResult, HiddenMarkovModel, fit_categorical_em

Params = Dict


@dataclass(frozen=True)
class VQVAEConfig:
    input_dim: int = 5
    hidden_dim: int = 64
    hidden_dim2: int = 32
    num_codes: int = 8       # K: codebook size == HMM state count
    latent_dim: int = 16     # D: code dimensionality
    commitment_beta: float = 0.25
    use_pallas: bool = False  # fused VQ kernel on TPU


class VQVAELoss(NamedTuple):
    total: jnp.ndarray
    recon: jnp.ndarray
    commitment: jnp.ndarray
    codebook: jnp.ndarray
    # per-code assignment histogram over VALID positions, (num_codes,)
    # i32 — free from the loss's own quantization; the training loop
    # uses it to detect and restart dead codes (gradient VQ only ever
    # updates assigned codes, so a code that starts dead stays dead)
    counts: jnp.ndarray


class VQVAEHMM:
    """Conv encoder -> per-timestep VQ -> conv decoder, plus an HMM over the
    discrete code sequence fit by Baum-Welch EM."""

    def __init__(self, cfg: VQVAEConfig):
        self.cfg = cfg

    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        ks = jax.random.split(key, 7)
        return {
            "encoder": {
                "conv1": ops.init_conv1d(ks[0], cfg.input_dim, cfg.hidden_dim, 3),
                "conv2": ops.init_conv1d(ks[1], cfg.hidden_dim, cfg.hidden_dim2, 3),
                "to_latent": ops.init_conv1d(ks[2], cfg.hidden_dim2,
                                             cfg.latent_dim, 1),
            },
            "codebook": jax.random.normal(
                ks[3], (cfg.num_codes, cfg.latent_dim)) * 0.5,
            "decoder": {
                "conv1": ops.init_conv1d(ks[4], cfg.latent_dim, cfg.hidden_dim, 3),
                "conv2": ops.init_conv1d(ks[5], cfg.hidden_dim, cfg.hidden_dim, 3),
                "to_out": ops.init_conv1d(ks[6], cfg.hidden_dim,
                                          cfg.input_dim, 1),
            },
        }

    def encode(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """x:(B,C,T) -> continuous latents z_e:(B,D,T)."""
        p = params["encoder"]
        h = jax.nn.relu(ops.conv1d_same(p["conv1"], x))
        h = jax.nn.relu(ops.conv1d_same(p["conv2"], h))
        return ops.conv1d_same(p["to_latent"], h)

    def quantize(self, params: Params, z_e: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> VQResult:
        """z_e:(B,D,T) -> straight-through z_q:(B,D,T) + indices (B,T).

        mask: optional (B,T) validity — losses averaged over valid
        positions only (ragged batches)."""
        z = jnp.transpose(z_e, (0, 2, 1))  # (B,T,D): contraction-friendly
        res = quantize_st(z, params["codebook"], self.cfg.commitment_beta,
                          use_pallas=self.cfg.use_pallas, mask=mask)
        return VQResult(jnp.transpose(res.quantized, (0, 2, 1)), res.indices,
                        res.commitment_loss, res.codebook_loss)

    def decode(self, params: Params, z_q: jnp.ndarray) -> jnp.ndarray:
        """z_q:(B,D,T) -> x_hat:(B,C,T)."""
        p = params["decoder"]
        h = jax.nn.relu(ops.conv1d_same(p["conv1"], z_q))
        h = jax.nn.relu(ops.conv1d_same(p["conv2"], h))
        return ops.conv1d_same(p["to_out"], h)

    def codes(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Discrete code-index sequences (B, T) — nearest-code lookup
        only (no straight-through machinery or loss reductions; eager
        callers like scripts/vq_quality.py would materialize that dead
        work on device)."""
        from ..ops.vq import vq_lookup

        z = jnp.transpose(self.encode(params, x), (0, 2, 1))
        _, idx = vq_lookup(z, params["codebook"])
        return idx

    def compute_loss(self, params: Params, x: jnp.ndarray,
                     lengths: Optional[jnp.ndarray] = None) -> VQVAELoss:
        """Masked MSE + commitment + codebook loss (pseudocode.txt:16-19)."""
        z_e = self.encode(params, x)
        vmask = (length_mask(lengths, x.shape[-1])
                 if lengths is not None else None)
        # mask ALL three terms, not just recon: unmasked VQ means would
        # pull codebook vectors toward padding latents and shift the
        # recon/VQ weighting with the padding fraction
        res = self.quantize(params, z_e, mask=vmask)
        x_hat = self.decode(params, res.quantized)
        if lengths is not None:
            m = vmask.astype(x.dtype)[:, None, :]
            # exact integer count (a low-precision mask sum cannot
            # represent large counts exactly)
            denom = jnp.maximum(
                lengths.sum().astype(jnp.float32) * x.shape[1], 1.0)
            recon = (((x_hat - x) ** 2) * m).sum() / denom
        else:
            recon = jnp.mean((x_hat - x) ** 2)
        total = recon + res.commitment_loss + res.codebook_loss
        onehot = jax.nn.one_hot(res.indices, self.cfg.num_codes,
                                dtype=jnp.int32)          # (B,T,K)
        if vmask is not None:
            onehot = onehot * vmask[..., None].astype(jnp.int32)
        counts = lax.stop_gradient(onehot.sum((0, 1)))
        return VQVAELoss(total, recon, res.commitment_loss,
                         res.codebook_loss, counts)

    def fit_hmm(self, params: Params, x: jnp.ndarray,
                lengths: Optional[jnp.ndarray] = None,
                n_iters: int = 50, seed: int = 0) -> EMResult:
        """Fit the regime HMM over discrete code indices by Baum-Welch
        (pseudocode.txt:26-27)."""
        codes = self.codes(params, x)
        return fit_categorical_em(codes, K=self.cfg.num_codes,
                                  V=self.cfg.num_codes, n_iters=n_iters,
                                  seed=seed, lengths=lengths)

    def sample(self, params: Params, hmm: HiddenMarkovModel, key: jax.Array,
               seq_len: int, batch: int = 1) -> jnp.ndarray:
        """Ancestral generation: hmm.sample -> codebook lookup -> decoder
        (pseudocode.txt:29-32).  The HMM's emission maps states to code
        indices; here states == codes (V == K)."""
        from .hmm import CategoricalEmission

        states, obs = hmm.sample(key, num_steps=seq_len, batch=batch)
        if isinstance(hmm.emission, CategoricalEmission):
            codes = obs.astype(jnp.int32)  # emitted symbols ARE codes
        elif hmm.emission is None:
            codes = states                 # bare chain: states as codes
        else:
            # a Gaussian emission's continuous obs would silently
            # truncate to garbage codebook indices (negatives wrap)
            raise ValueError(
                "VQVAEHMM.sample needs a categorical-emission (or "
                "emission-free) HMM whose symbols index the codebook; "
                f"got {type(hmm.emission).__name__}")
        z_q = params["codebook"][codes]          # (B,T,D)
        return self.decode(params, jnp.transpose(z_q, (0, 2, 1)))
