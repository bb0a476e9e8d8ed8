from .config import Config, ModelConfig, DataConfig, TrainConfig, load_config
from .masking import length_mask, pairwise_mask
