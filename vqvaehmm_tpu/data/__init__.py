from .dataset import (RandomChunkDataset, batch_iterator, collate_fn,
                      epoch_arrays, pick_bucket)
from .synthetic import synthetic_returns, synthetic_sequences
from .checkpoint import (load_checkpoint, load_params_npz, save_checkpoint,
                         save_params_npz)
from .device_sampler import DeviceEpochSampler
