"""vqvaehmm_tpu — TPU-native VQ-VAE-HMM market-regime framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
yashnaray/VQ-VAE-HMM-model: the VAE-HMM regime detector, exact HMM inference
(forward-backward/Viterbi — a capability upgrade over the reference's
mean-field-only posterior), a true VQ codebook, the downstream portfolio /
hedging / regime-utility zoo, losses, trainers, backtesting, calibration,
evaluation, and serving — all as jit-compiled pure functions over parameter
pytrees, data-parallel over a `jax.sharding.Mesh`.
"""

from .core.config import (Config, DataConfig, MeshConfig, ModelConfig,
                          PortfolioConfig, TrainConfig, apply_overrides,
                          config_from_dict, load_config)
from .models.vae_hmm import VAEHMM, make_model
from .data.dataset import RandomChunkDataset, collate_fn, batch_iterator
from .train.trainer import (TrainState, beta_schedule, create_train_state,
                            make_epoch_step, make_train_step, train_model)

__version__ = "0.1.0"

__all__ = [
    "Config", "ModelConfig", "DataConfig", "TrainConfig", "PortfolioConfig",
    "MeshConfig", "load_config", "config_from_dict", "apply_overrides",
    "VAEHMM", "make_model",
    "RandomChunkDataset", "collate_fn", "batch_iterator",
    "TrainState", "train_model", "make_train_step", "make_epoch_step",
    "create_train_state", "beta_schedule",
]
