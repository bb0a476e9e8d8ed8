"""Jitted training for the VAE-HMM core.

Covers the reference's training layer:
* train_model      (VQ_VAE_HMM_fixed.py:145-162) — Adam + beta annealing
* Trainer          (src/training/trainer.py:9-43) — adds grad clip 1.0

TPU-native execution model: one `train_step` compiled once; optionally a
whole epoch of batches fused into a single lax.scan so the device never
waits on the host between steps (the reference pays a host sync per batch at
loss.item(), VQ_VAE_HMM_fixed.py:158).  Multi-chip data parallelism comes
from sharding the batch dim over a mesh; the gradient psum over ICI is
inserted by XLA.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataset import RandomChunkDataset, epoch_arrays
from ..models.vae_hmm import VAEHMM


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray  # global step counter


def resolve_input_pipeline(value: str = "auto",
                           backend: Optional[str] = None) -> str:
    """Resolve the input-pipeline selection to 'host' or 'device'.

    'auto' (the config default) picks the measured-fast path for the
    backend: 'device' on TPU (the pool lives in HBM, the host ships only
    index triples and the gather runs inside the training scan — the
    host path feeds the fused step at ~1% of its rate on a 1-core host,
    BENCH_NOTES.md "Pallas gather"), 'host' elsewhere (the parity
    sample stream, and CPU training is host-bound anyway).  Explicit
    'host'/'device' pass through unchanged.
    """
    if value in ("host", "device"):
        return value
    if value not in ("auto", None):
        raise ValueError(f"unknown input_pipeline {value!r}; "
                         "expected 'auto', 'host' or 'device'")
    backend = backend or jax.default_backend()
    return "device" if backend == "tpu" else "host"


def resolve_fused(value, model_cfg, batch_size: int, max_len: int,
                  backend: Optional[str] = None, log_fn=print) -> bool:
    """Resolve the fused-train-step selection to a concrete bool.

    value: False -> XLA path; True -> Pallas path where
    train_step_supported, with a logged XLA fallback otherwise (forcing
    an unsupported shape must not crash a production run at trace time);
    'auto'/None -> Pallas exactly when the backend is TPU AND the shapes
    qualify (the kernel's gate bounds backend, dtype, lane tiling and
    VMEM — ops/pallas_train.py).
    """
    if value is False:
        return False
    if value not in (True, "auto", None):
        raise ValueError(f"unknown fused {value!r}; "
                         "expected true, false or 'auto'")
    from ..ops.pallas_train import train_step_supported

    supported = (batch_size > 0
                 and train_step_supported(model_cfg, batch_size, max_len))
    if value is True:
        if not supported and log_fn:
            log_fn(f"fused step unsupported at T={max_len}, "
                   f"B={batch_size}; using the XLA path")
        return supported
    backend = backend or jax.default_backend()
    return backend == "tpu" and supported


def beta_schedule(epoch: int, num_epochs: int, warmup: bool = True) -> float:
    """KL annealing beta = min(1, 2(ep+1)/E)  (reference :151)."""
    if not warmup:
        return 1.0
    return min(1.0, 2.0 * (epoch + 1) / num_epochs)


def make_lr_schedule(lr: float, schedule: str = "constant",
                     warmup_steps: int = 0,
                     total_steps: Optional[int] = None,
                     final_lr_frac: float = 0.0):
    """Step-indexed learning-rate schedule, or the plain float for the
    default.  The reference trains at a fixed lr (train.py:28); schedules
    are a framework extension — "constant" with no warmup returns `lr`
    itself so the parity path is bit-identical to a bare optax.adam(lr).

    schedule:      "constant" | "cosine" | "linear" (decay after warmup)
    warmup_steps:  linear 0 -> lr over this many optimizer steps
    total_steps:   schedule horizon (required for cosine/linear decay)
    final_lr_frac: decay floor as a fraction of lr
    """
    if schedule == "constant" and warmup_steps <= 0:
        return lr
    if schedule == "constant":
        base = optax.constant_schedule(lr)
    elif schedule in ("cosine", "linear"):
        if not total_steps:
            raise ValueError(f"schedule={schedule!r} needs total_steps")
        decay = max(1, int(total_steps) - int(warmup_steps))
        if schedule == "cosine":
            base = optax.cosine_decay_schedule(lr, decay_steps=decay,
                                               alpha=final_lr_frac)
        else:
            base = optax.linear_schedule(lr, lr * final_lr_frac, decay)
    else:
        raise ValueError(f"unknown lr schedule {schedule!r} "
                         "(constant | cosine | linear)")
    if warmup_steps > 0:
        base = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), base],
            [warmup_steps])
    return base


def make_optimizer(lr: float, gradient_clip: Optional[float] = None,
                   schedule: str = "constant", warmup_steps: int = 0,
                   total_steps: Optional[int] = None,
                   final_lr_frac: float = 0.0):
    """Adam matching torch defaults (betas 0.9/0.999, eps 1e-8); optional
    global-norm clip 1.0 as in the reference Trainer
    (src/training/trainer.py:31).  Defaults are the reference-parity
    configuration; the schedule knobs layer warmup/decay on top (the
    schedule rides the optimizer step count in opt_state, so
    checkpoint/resume continues it exactly)."""
    tx = optax.adam(make_lr_schedule(lr, schedule, warmup_steps,
                                     total_steps, final_lr_frac))
    if gradient_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    return tx


def create_train_state(model: VAEHMM, key: jax.Array, lr: float,
                       gradient_clip: Optional[float] = None) -> TrainState:
    params = model.init(key)
    tx = make_optimizer(lr, gradient_clip)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _sgd_update(model: VAEHMM, tx: optax.GradientTransformation,
                state: TrainState, x, u, lengths, beta,
                fused: bool = False, mesh: Optional[Mesh] = None):
    """One optimizer update — the single source of truth shared by the
    per-batch step and the epoch-fused scan.

    fused=True computes loss AND all parameter gradients in one
    VMEM-resident Pallas kernel (ops/pallas_train.py) instead of
    jax.value_and_grad over the XLA forward — same update, a fraction of
    the HBM traffic.  With a mesh, the fused kernel runs per-shard under
    shard_map with globally-correct normalizations and a gradient psum
    over the data axis (XLA cannot partition the kernel itself).

    Token-layout inputs (ops/pallas_gather.py) do NOT come through here:
    the device sampler's tokens_update calls fused_loss_and_grads +
    _apply_grads directly (per-shard inside shard_map under a mesh)."""
    if fused:
        from ..ops.pallas_train import fused_loss_and_grads

        if mesh is not None:
            from jax import shard_map

            def per_shard(p, xx, uu, ll, bb):
                return fused_loss_and_grads(model, p, xx, uu, ll, bb,
                                            axis_name="data")

            loss, grads = shard_map(
                per_shard, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P()),
                out_specs=(P(), P()), check_vma=False,
            )(state.params, x, u, lengths, beta)
        else:
            loss, grads = fused_loss_and_grads(model, state.params, x, u,
                                               lengths, beta)
    else:
        def loss_fn(p):
            return model.compute_loss(p, x, u, lengths, beta)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return _apply_grads(tx, state, grads), loss


def _apply_grads(tx: optax.GradientTransformation, state: TrainState,
                 grads) -> TrainState:
    """Optimizer tail shared by _sgd_update and external fused callers
    (e.g. the device sampler's sharded token path)."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1)


def make_train_step(model: VAEHMM, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    fused: bool = False):
    """Build the jitted single-batch update.

    With a mesh, the batch arguments are sharded over the data axis and the
    state is replicated; jit inserts the gradient all-reduce (XLA path) or
    a shard_map + psum wraps the fused kernel (fused path).
    """

    def step(state: TrainState, x, u, lengths, beta):
        return _sgd_update(model, tx, state, x, u, lengths, beta,
                           fused=fused, mesh=mesh)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_epoch_step(model: VAEHMM, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    fused: bool = False):
    """Whole-epoch update: lax.scan over a stacked epoch of batches.

    One dispatch and one host sync per *epoch* instead of per batch.
    """

    def epoch(state: TrainState, xs, us, lens, beta):
        def body(st, batch):
            x, u, l = batch
            return _sgd_update(model, tx, st, x, u, l, beta, fused=fused,
                               mesh=mesh)

        state, losses = jax.lax.scan(body, state, (xs, us, lens))
        return state, losses.mean()

    dn = (0,) if donate else ()
    if mesh is None:
        return jax.jit(epoch, donate_argnums=dn)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))  # (num_batches, B, ...)
    return jax.jit(
        epoch,
        in_shardings=(repl, data, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=dn,
    )


class Trainer:
    """Object-style wrapper over the jitted trainer, mirroring the
    reference Trainer API (src/training/trainer.py:9-43: train_epoch /
    train, grad clip 1.0, optional custom loss, beta warm-up flag)."""

    def __init__(self, model: VAEHMM, lr: float = 1e-3,
                 gradient_clip: Optional[float] = 1.0,
                 beta_warmup: bool = True, seed: int = 0,
                 fused: bool = False,
                 device_data: Optional[bool] = None):
        self.model = model
        self.tx = make_optimizer(lr, gradient_clip)
        params = model.init(jax.random.PRNGKey(seed))
        self.state = TrainState(params, self.tx.init(params),
                                jnp.zeros((), jnp.int32))
        self.beta_warmup = beta_warmup
        self._fused = fused
        # Mirrors train_model's device_data: None = auto (device input
        # pipeline on TPU), False = host-assembled epochs everywhere (the
        # documented host sample stream, e.g. to reproduce a CPU-seeded
        # trajectory on-chip), True = force the device sampler.
        self._device_data = device_data
        self._epoch_step = make_epoch_step(model, self.tx, fused=fused)

    @property
    def params(self):
        return self.state.params

    def train_epoch(self, dataset: RandomChunkDataset, batch_size: int,
                    beta: float = 1.0) -> float:
        device_data = self._device_data
        if device_data is None:
            device_data = jax.default_backend() == "tpu"
        if device_data:
            # device input pipeline (index triples + on-chip gather, the
            # train_model device_data path); one sampler/step per dataset
            if getattr(self, "_sampler_ds", None) is not dataset:
                from ..data.device_sampler import DeviceEpochSampler

                self._sampler_ds = dataset
                self._sampler = DeviceEpochSampler(dataset)
                self._gstep = self._sampler.make_epoch_step(
                    self.model, self.tx, fused=self._fused)
            si, st, ln = self._sampler.sample_indices_fast(
                batch_size, len(dataset) // batch_size)
            self.state, mean_loss = self._gstep(
                self.state, jnp.asarray(si), jnp.asarray(st),
                jnp.asarray(ln), jnp.float32(beta))
            return float(mean_loss)
        xs, us, lens = epoch_arrays(dataset, batch_size)
        self.state, mean_loss = self._epoch_step(self.state, xs, us, lens,
                                                 jnp.float32(beta))
        return float(mean_loss)

    def train(self, dataset: RandomChunkDataset, num_epochs: int,
              batch_size: int = 64, log_fn=print) -> list:
        history = []
        for ep in range(num_epochs):
            beta = beta_schedule(ep, num_epochs, self.beta_warmup)
            loss = self.train_epoch(dataset, batch_size, beta)
            history.append(loss)
            if log_fn:
                log_fn(f"Epoch {ep + 1}/{num_epochs}, Loss: {loss:.4f}")
        return history


def train_model(model: VAEHMM, dataset: RandomChunkDataset,
                num_epochs: int = 10, lr: float = 1e-3,
                batch_size: int = 64, seed: int = 0,
                gradient_clip: Optional[float] = None,
                beta_warmup: bool = True,
                mesh: Optional[Mesh] = None,
                state: Optional[TrainState] = None,
                fused: Optional[bool] = None,
                device_data: Optional[bool] = None,
                log_fn=print) -> Tuple[TrainState, list]:
    """End-to-end training loop with the reference's schedule
    (reference: VQ_VAE_HMM_fixed.py:145-162), epoch-fused on device.

    fused=True uses the single-kernel Pallas loss+grads path (see
    ops/pallas_train.py); None (default) = auto — the fused path exactly
    when the backend is TPU and the shapes pass the kernel's gate, so a
    zero-knob call trains at the measured-fast configuration.

    device_data: None = auto (on TPU, feed via the device-side input
    pipeline — host ships only index triples per epoch, the gather runs
    on-chip through the Pallas window-gather kernel when supported;
    end-to-end goodput matches device-resident training, BENCH_NOTES
    "Pallas gather").  The sample STREAM differs from the host path for
    a given seed (as the native C sampler's already does); the
    distribution is identical.  False forces host-assembled epochs.
    Returns the final TrainState and the per-epoch mean losses.
    """
    tx = make_optimizer(lr, gradient_clip)
    if state is None:
        params = model.init(jax.random.PRNGKey(seed))
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    if device_data is None:
        device_data = jax.default_backend() == "tpu"
    n_shards = mesh.devices.size if mesh is not None else 1
    fused = resolve_fused("auto" if fused is None else fused, model.cfg,
                          batch_size // max(n_shards, 1), dataset.max_len,
                          log_fn=log_fn)

    history = []
    if device_data:
        from ..data.device_sampler import DeviceEpochSampler

        sampler = DeviceEpochSampler(dataset)
        gstep = sampler.make_epoch_step(model, tx, fused=fused, mesh=mesh)
        num_batches = len(dataset) // batch_size
        for ep in range(num_epochs):
            beta = beta_schedule(ep, num_epochs, beta_warmup)
            si, st, ln = sampler.sample_indices_fast(batch_size,
                                                     num_batches)
            state, mean_loss = gstep(state, jnp.asarray(si),
                                     jnp.asarray(st), jnp.asarray(ln),
                                     jnp.float32(beta))
            if log_fn is not None:
                # live logging costs a per-epoch device sync (~2x wall
                # through a high-latency dispatch path)
                loss = float(mean_loss)
                history.append(loss)
                log_fn(f"Epoch {ep + 1}/{num_epochs}, Loss: {loss:.4f}")
            else:
                history.append(mean_loss)   # device scalar: epochs
                #                             pipeline with no host sync
        return state, [float(l) for l in history]

    epoch_step = make_epoch_step(model, tx, mesh=mesh, fused=fused)

    from ..data.prefetch import prefetch_epochs

    epochs = prefetch_epochs(dataset, batch_size, num_epochs) \
        if mesh is None else (
            epoch_arrays(dataset, batch_size) for _ in range(num_epochs))
    for ep, (xs, us, lens) in enumerate(epochs):
        beta = beta_schedule(ep, num_epochs, beta_warmup)
        state, mean_loss = epoch_step(state, xs, us, lens,
                                      jnp.float32(beta))
        loss = float(mean_loss)
        history.append(loss)
        if log_fn is not None:
            log_fn(f"Epoch {ep + 1}/{num_epochs}, Loss: {loss:.4f}")
    return state, history
