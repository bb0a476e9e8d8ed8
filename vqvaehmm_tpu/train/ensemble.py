"""Vmapped multi-seed ensemble training.

The reference's only answer to seed sensitivity is rerunning the whole
script (train.py's fixed seed; train_simple.py's GMM uses n_init=10
restarts but the VAE-HMM itself gets one draw).  On TPU the idiomatic
answer is to train every seed SIMULTANEOUSLY: the member axis vmaps over
the TrainState pytree, turning the model's small matmuls into batched
matmuls the MXU actually fills, while the epoch data is shared — one
jitted dispatch per epoch advances N independent Adam trajectories.

Same pattern as the vmapped multi-restart Baum-Welch in models/hmm.py
and the vmapped EM restarts in models/gmm.py; this extends it to the
full VAE-HMM optimizer loop.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import RandomChunkDataset, epoch_arrays
from ..models.vae_hmm import VAEHMM
from .trainer import (TrainState, _sgd_update, beta_schedule,
                      make_optimizer, resolve_fused)


def init_ensemble_state(model: VAEHMM, tx, seeds: Sequence[int]
                        ) -> TrainState:
    """Stacked TrainState with a leading member axis: member i is
    exactly the state `create_train_state` would build from seed i."""
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    params = jax.vmap(model.init)(keys)
    opt_state = jax.vmap(tx.init)(params)
    return TrainState(params, opt_state,
                      jnp.zeros((len(seeds),), jnp.int32))


def make_ensemble_epoch_step(model: VAEHMM, tx, donate: bool = True,
                             mesh=None, axis: str = "data",
                             fused: bool = False):
    """Epoch update over the member axis of a stacked TrainState.  The
    epoch data (xs, us, lens) is SHARED across members (in_axes=None via
    closure); each member advances its own Adam trajectory.  Returns
    step(states, xs, us, lens, beta) ->
    (states, per-member mean loss (N,)).

    fused=False (default) vmaps the XLA update over members.  Measured
    on-chip this scales SUPER-linearly (n=8 costs 11.6x n=1 at the
    benchmark shape — the batched convs XLA builds for the member axis
    are less efficient than the solo lowering, BENCH_NOTES "Ensemble
    member-axis marginal").  fused=True instead lax.map's the members,
    each running the single-kernel Pallas loss+grads path
    (ops/pallas_train.py) — sequential over members but each at the
    fused step's rate, which is the faster configuration wherever the
    kernel is supported (ops.pallas_train.train_step_supported).

    mesh: shard the MEMBER axis over `axis` — ensemble parallelism via
    shard_map: each chip runs the scan over its LOCAL members against
    the replicated epoch data, with zero collectives (letting jit
    partition the vmap instead would turn the batched convs into
    grouped convs and demand feature dims divisible by the axis size).
    len(seeds) must be divisible by the axis size."""

    def epoch(states: TrainState, xs, us, lens, beta):
        def body(st, batch):
            x, u, l = batch
            return _sgd_update(model, tx, st, x, u, l, beta, fused=fused)

        def one_member(st):
            return jax.lax.scan(body, st, (xs, us, lens))

        if fused:
            # the Pallas kernel takes ONE param set per call: run the
            # members sequentially (lax.map), each via the fused step
            states, losses = jax.lax.map(one_member, states)
        else:
            states, losses = jax.vmap(one_member)(states)  # (N, nb)
        return states, losses.mean(axis=1)

    dn = (0,) if donate else ()
    if mesh is None:
        return jax.jit(epoch, donate_argnums=dn)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded = shard_map(
        epoch, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=dn)


def ensemble_member(states: TrainState, i: int) -> TrainState:
    """Extract member i as a plain (unstacked) TrainState."""
    return jax.tree_util.tree_map(lambda a: a[i], states)


def train_ensemble(model: VAEHMM, dataset: RandomChunkDataset,
                   seeds: Sequence[int], num_epochs: int = 10,
                   lr: float = 1e-3, batch_size: int = 64,
                   gradient_clip: Optional[float] = None,
                   beta_warmup: bool = True,
                   device_data: Optional[bool] = None,
                   fused: bool = False,
                   log_fn=print) -> Tuple[TrainState, np.ndarray, int]:
    """Train len(seeds) independent models in one vmapped loop over
    shared epoch data (same schedule as train_model — reference
    VQ_VAE_HMM_fixed.py:145-162).

    device_data mirrors train_model: None = auto (on TPU the epoch is
    assembled IN HBM by the device sampler's gather — the host ships
    only index triples, since host assembly is ~150x too slow to feed
    an on-chip step); False forces host epoch_arrays (the sample stream
    that matches train_model(device_data=False) for a given seed).

    fused mirrors train_model's flag: each member's update runs the
    single-kernel Pallas loss+grads path (members lax.map'd — measured
    3.2x the vmapped-XLA ensemble's total throughput on-chip at n=8,
    and sub-linear in n: 7.52x for 8 members, BENCH_NOTES "Ensemble
    member-axis marginal").

    Returns (stacked TrainState, per-member loss history (N, epochs),
    index of the member with the best final loss).  Pull the winner out
    with `ensemble_member(states, best)`.
    """
    # gate like train_model: forcing the kernel at unsupported shapes
    # must log and fall back to XLA, not die in a trace-time ValueError
    # (members see the FULL batch each — the member axis is not a data
    # shard — so the gate is at (batch_size, max_len))
    fused = resolve_fused(fused, model.cfg, batch_size, dataset.max_len,
                          log_fn=log_fn)
    tx = make_optimizer(lr, gradient_clip)
    states = init_ensemble_state(model, tx, seeds)
    step = make_ensemble_epoch_step(model, tx, fused=fused)
    if device_data is None:
        device_data = jax.default_backend() == "tpu"
    sampler = None
    if device_data:
        from ..data.device_sampler import DeviceEpochSampler

        sampler = DeviceEpochSampler(dataset)
        num_batches = len(dataset) // batch_size

    history = []
    for ep in range(num_epochs):
        beta = beta_schedule(ep, num_epochs, beta_warmup)
        if sampler is not None:
            # on-device epoch assembly (one jitted gather dispatch);
            # the vectorized index draws cost ~nothing on the host
            xs, us, lens = sampler.epoch(batch_size, num_batches,
                                         exact_stream=False)
        else:
            xs, us, lens = epoch_arrays(dataset, batch_size)
        states, losses = step(states, xs, us, lens, jnp.float32(beta))
        history.append(losses)  # device (N,); no per-epoch host sync
        if log_fn is not None:
            l_np = np.asarray(losses)
            log_fn(f"Epoch {ep + 1}/{num_epochs}, "
                   f"loss min {l_np.min():.4f} / "
                   f"median {np.median(l_np):.4f} / max {l_np.max():.4f}")
    hist = np.stack([np.asarray(l) for l in history], axis=1)  # (N, E)
    best = int(hist[:, -1].argmin())
    return states, hist, best
