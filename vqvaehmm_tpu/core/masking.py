"""Length-mask utilities.

The whole framework uses static shapes + boolean masks (the reference's own
masking idiom at VQ_VAE_HMM_fixed.py:111, which is exactly what XLA wants:
batches are padded to a fixed T and validity is carried in `lengths`).
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, T) bool mask, True at valid timesteps.

    Matches `torch.arange(T)[None,:] < lengths[:,None]`
    (reference: VQ_VAE_HMM_fixed.py:111).
    """
    return jnp.arange(T)[None, :] < lengths[:, None]


def pairwise_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) mask -> (B, T-1) mask of valid (t-1, t) transition pairs.

    Matches `mask[:,1:] & mask[:,:-1]` (reference: VQ_VAE_HMM_fixed.py:128).
    """
    return mask[:, 1:] & mask[:, :-1]
