"""Device-side input pipeline example (docs/data.md).

Shows the three feeding strategies sharing one contract — host-assembled
epochs, on-device gather, and the gather fused into the training scan —
and that the device paths reproduce the host path's training exactly.

Run: JAX_PLATFORMS=cpu python examples/device_pipeline_example.py
"""

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")

import jax
import jax.numpy as jnp
import numpy as np

from vqvaehmm_tpu import TrainState, make_epoch_step, make_model
from vqvaehmm_tpu.data import DeviceEpochSampler, RandomChunkDataset
from vqvaehmm_tpu.data.dataset import epoch_arrays
from vqvaehmm_tpu.data.synthetic import synthetic_sequences
from vqvaehmm_tpu.train.trainer import make_optimizer


def main():
    xs, us, _ = synthetic_sequences(6, 120, 5, 4, 3, seed=0)
    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))
    B, NB = 8, 4

    # 1. host path: epochs assembled on the host (reference DataLoader
    #    shape), shipped whole
    ds = RandomChunkDataset(xs, us, min_len=16, max_len=48,
                            samples_per_epoch=NB * B, seed=3)
    x, u, lens = epoch_arrays(ds, B, use_native=False)
    step = make_epoch_step(model, tx, donate=False)
    s = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s, loss_host = step(s, jnp.asarray(x), jnp.asarray(u),
                        jnp.asarray(lens), jnp.float32(1.0))
    print(f"host-assembled epoch:      loss {float(loss_host):.6f}")

    # 2. device gather: same seed -> bit-identical epoch, assembled in HBM
    ds2 = RandomChunkDataset(xs, us, min_len=16, max_len=48,
                             samples_per_epoch=NB * B, seed=3)
    sampler = DeviceEpochSampler(ds2)
    xd, ud, ld = sampler.epoch(B)         # exact_stream=True by default
    s2 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s2, loss_dev = step(s2, xd, ud, ld, jnp.float32(1.0))
    print(f"on-device gathered epoch:  loss {float(loss_dev):.6f}")

    # 3. gather fused into the training scan: one dispatch per epoch,
    #    the host ships only three (batches, B) int32 index arrays
    gstep = sampler.make_epoch_step(model, tx, donate=False)
    si, st, ln = sampler.sample_indices_fast(B, NB)
    s3 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s3, loss_scan = gstep(s3, jnp.asarray(si), jnp.asarray(st),
                          jnp.asarray(ln), jnp.float32(1.0))
    print(f"gather-in-scan epoch:      loss {float(loss_scan):.6f} "
          f"(fresh index stream)")

    same = abs(float(loss_host) - float(loss_dev)) < 1e-7
    print(f"device gather matches host path: {same}")


if __name__ == "__main__":
    main()
