"""Config-driven training pipeline + CLI (reference:
training_pipeline/train.py:63-151, the Docker MODE=train path).

config(JSON/YAML) -> seed -> build VAEHMM -> load sequences -> train with
the jitted epoch loop -> orbax checkpoint (with optimizer state and step,
so it resumes — an upgrade over the reference's bare state_dict save,
training_pipeline/train.py:134-137).
"""

from __future__ import annotations

import contextlib
import os
import signal
import sys
from typing import Optional, Tuple

import jax
import numpy as np

from ..core.config import Config, apply_overrides, load_config
from ..data.checkpoint import save_checkpoint, save_params_npz
from ..data.dataset import RandomChunkDataset
from ..models.vae_hmm import VAEHMM
from ..parallel.mesh import create_mesh
from .trainer import TrainState


def load_sequences(x_path: str, u_path: str
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Load sequence tensors from .npy/.npz/.pt/.pth
    (reference: training_pipeline/train.py:37-60)."""

    def load_one(p: str) -> np.ndarray:
        if p.endswith((".npy",)):
            return np.load(p)
        if p.endswith(".npz"):
            data = np.load(p)
            return data[list(data.files)[0]]
        if p.endswith((".pt", ".pth")):
            import torch

            return np.asarray(torch.load(p, map_location="cpu",
                                         weights_only=True))
        raise ValueError(f"Unsupported data format for {p}")

    return load_one(x_path), load_one(u_path)


@contextlib.contextmanager
def _sigterm_flag():
    """Yield a list that becomes truthy when SIGTERM arrives, restoring
    the previous handler on exit.  SIGTERM is the preemption signal of
    spot/preemptible TPU VMs and of k8s pod eviction — training must
    checkpoint and exit cleanly, not die mid-epoch.  Outside the main
    thread (a CPython signal restriction) the flag is inert and the
    default SIGTERM behaviour stands."""
    flag = []
    try:
        prev = signal.signal(signal.SIGTERM,
                             lambda signum, frame: flag.append(True))
    except ValueError:  # not the main thread
        yield flag
        return
    try:
        yield flag
    finally:
        signal.signal(signal.SIGTERM, prev)


class TrainPipeline:
    """End-to-end config-driven training (reference: TrainPipeline,
    training_pipeline/train.py:63-139)."""

    def __init__(self, cfg: Config, use_mesh: bool = False):
        self.cfg = cfg
        self.mesh = create_mesh(cfg.mesh.num_devices) if use_mesh else None
        # True after train() returned early on SIGTERM: the returned
        # state is the checkpointed partial run, NOT a finished model —
        # callers must not publish artifacts from it (full_recipe checks
        # this; the CLI exits 75/EX_TEMPFAIL)
        self.preempted = False

    def build_model(self) -> VAEHMM:
        return VAEHMM(self.cfg.model)

    def load_data(self) -> RandomChunkDataset:
        d = self.cfg.data
        if os.path.exists(d.x_sequences_path):
            xs, us = load_sequences(d.x_sequences_path, d.u_sequences_path)
        else:
            # synthetic fallback so the pipeline runs anywhere (the
            # reference hard-fails without data files)
            from ..data.synthetic import synthetic_sequences

            xs, us, _ = synthetic_sequences(
                n_sequences=8, seq_len=max(d.max_len, 100),
                input_dim=self.cfg.model.input_dim,
                u_dim=self.cfg.model.u_dim or 1, K=self.cfg.model.K,
                seed=self.cfg.training.seed)
        self._val_arrays = None
        frac = float(getattr(d, "val_fraction", 0.0) or 0.0)
        if frac > 0.0:
            # deterministic split: the LAST k sequences are validation —
            # identical on every (re)run of the same config, so resume
            # tracks the same metric over the same windows
            if len(xs) < 2:
                raise ValueError("val_fraction needs >= 2 sequences")
            k = min(max(int(round(len(xs) * frac)), 1), len(xs) - 1)
            T = min(xs.shape[2], d.max_len)
            self._val_arrays = (np.asarray(xs[-k:, :, :T], np.float32),
                                np.asarray(us[-k:, :, :T], np.float32),
                                np.full((k,), T, np.int32))
            xs, us = xs[:-k], us[:-k]
        return RandomChunkDataset(xs, us, min_len=d.min_len,
                                  max_len=d.max_len,
                                  samples_per_epoch=d.samples_per_epoch,
                                  seed=self.cfg.training.seed)

    def train(self, log_fn=print, resume: bool = True) -> TrainState:
        """Train with periodic checkpointing every `save_freq` epochs and
        automatic resume from the latest periodic checkpoint.

        Implements what the reference only configures (save_freq in
        configs/config.yaml:32-34 has no implementing code — SURVEY.md
        section 5); resume restores params + optimizer state + epoch.
        """
        import jax.numpy as jnp

        if getattr(self.cfg.model, "family", "vae") == "vqvae":
            # the true-VQ family (reference pseudocode.txt:1-32) has its
            # own trainer + archive format; the knobs it honours are
            # documented on train_vq_stack
            from .vq_pipeline import train_vq_pipeline

            self.preempted = False
            return train_vq_pipeline(self, log_fn=log_fn, resume=resume)

        from ..data.checkpoint import load_checkpoint, load_metadata
        from .trainer import (TrainState, beta_schedule, make_epoch_step,
                              make_optimizer, resolve_fused,
                              resolve_input_pipeline)
        from ..data.dataset import epoch_arrays

        t = self.cfg.training
        self.preempted = False  # a reused pipeline may resume to completion
        model = self.build_model()
        dataset = self.load_data()
        os.makedirs(t.checkpoint_dir, exist_ok=True)

        if getattr(t, "ensemble_seeds", ()):
            # one-shot multi-seed run: every seed trains simultaneously
            # in one vmapped loop; the best-final-loss member becomes
            # THE checkpoint (train/ensemble.py; no resume/periodic)
            from .ensemble import ensemble_member, train_ensemble

            seeds = list(t.ensemble_seeds)
            device_data = resolve_input_pipeline(
                getattr(t, "input_pipeline", "auto")) == "device"
            # members see the FULL batch each (the member axis is not a
            # data shard), so gate at (batch_size, max_len);
            # train_ensemble re-gates too, but resolving here keeps the
            # pipeline's log message and selection in one place
            fused = resolve_fused(getattr(t, "fused", "auto"),
                                  self.cfg.model, t.batch_size,
                                  self.cfg.data.max_len, log_fn=log_fn)
            states, hist, best = train_ensemble(
                model, dataset, seeds, num_epochs=t.num_epochs,
                lr=t.learning_rate, batch_size=t.batch_size,
                gradient_clip=t.gradient_clip,
                device_data=device_data, fused=fused, log_fn=log_fn)
            state = ensemble_member(states, best)
            ckpt_path = os.path.join(t.checkpoint_dir, "vae_hmm_trained")
            save_checkpoint(ckpt_path, state, metadata={
                "epochs": t.num_epochs,
                "ensemble_seeds": seeds,
                "best_seed": seeds[best],
                "final_loss": float(hist[best, -1]),
                "per_member_final_loss": [float(l) for l in hist[:, -1]],
            })
            save_params_npz(ckpt_path + ".npz", state.params)
            if log_fn:
                log_fn(f"ensemble: best seed {seeds[best]} "
                       f"(loss {hist[best, -1]:.4f}) -> {ckpt_path}")
            return state

        periodic = os.path.join(t.checkpoint_dir, "vae_hmm_periodic")

        nb_total = len(dataset) // t.batch_size
        tx = make_optimizer(
            t.learning_rate, t.gradient_clip,
            schedule=getattr(t, "lr_schedule", "constant"),
            warmup_steps=int(getattr(t, "warmup_steps", 0) or 0),
            total_steps=t.num_epochs * max(nb_total, 1),
            final_lr_frac=float(getattr(t, "final_lr_frac", 0.0) or 0.0))
        params = model.init(jax.random.PRNGKey(t.seed))
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32))
        start_epoch = 0
        # early-stop trackers; persisted in the periodic metadata so a
        # preempted-and-resumed run stops at the same epoch
        patience = int(getattr(t, "early_stop_patience", 0) or 0)
        min_delta = float(getattr(t, "early_stop_min_delta", 0.0) or 0.0)
        # data.val_fraction: per-epoch validation ELBO (beta=1, whole
        # held-out windows, one jitted call); when early stopping is on,
        # patience tracks THIS instead of the training loss
        val_loss_fn = None
        if getattr(self, "_val_arrays", None) is not None:
            xv, uv, lv = (jnp.asarray(a) for a in self._val_arrays)
            val_loss_fn = jax.jit(
                lambda p: model.compute_loss(p, xv, uv, lv, 1.0))
        best_loss, wait = float("inf"), 0
        meta = load_metadata(periodic) if resume else None
        if meta is not None and os.path.exists(periodic):
            state = load_checkpoint(periodic, state)
            start_epoch = int(meta.get("epoch", 0))
            best_loss = float(meta.get("best_loss", best_loss))
            wait = int(meta.get("wait", 0))
            if log_fn:
                log_fn(f"Resumed from epoch {start_epoch} "
                       f"(step {int(state.step)})")

        # under a mesh the kernel runs per shard on the LOCAL batch
        n_shards = self.mesh.devices.size if self.mesh is not None else 1
        fused = resolve_fused(getattr(t, "fused", "auto"), self.cfg.model,
                              t.batch_size // max(n_shards, 1),
                              self.cfg.data.max_len, log_fn=log_fn)
        device_input = resolve_input_pipeline(
            getattr(t, "input_pipeline", "auto")) == "device"
        if log_fn and (fused or device_input):
            log_fn(f"input_pipeline={'device' if device_input else 'host'}"
                   f" fused={fused} "
                   f"(backend={jax.default_backend()})")
        if device_input:
            from ..data.device_sampler import DeviceEpochSampler

            sampler = DeviceEpochSampler(dataset)
            gstep = sampler.make_epoch_step(model, tx, fused=fused,
                                            mesh=self.mesh)
            num_batches = len(dataset) // t.batch_size
        else:
            epoch_step = make_epoch_step(model, tx, mesh=self.mesh,
                                         fused=fused)

        if start_epoch > 0:
            # fast-forward the stateful data stream: epochs
            # [0, start_epoch) consumed dataset-rng draws, so a resumed
            # run must replay them or its epochs see DIFFERENT samples
            # than the uninterrupted run — resume is trajectory-exact,
            # not merely distribution-exact (pinned by
            # tests/test_pipeline.py::test_sigterm_checkpoints_and_resumes)
            from ..data.dataset import epoch_skip

            for _ in range(start_epoch):
                if device_input:
                    sampler.sample_indices_fast(t.batch_size, num_batches)
                else:
                    epoch_skip(dataset, t.batch_size)

        # steps_per_call > 0 splits each epoch's scan into bounded jitted
        # calls (trajectory identical — the scan is sequential either
        # way).  Use when one whole-epoch dispatch would outlive an
        # external bound (`timeout`-guarded on-chip stages, preemptible
        # runs): the cost is one extra host round-trip per chunk.  At
        # most two executables compile (full chunk + remainder).
        spc = int(getattr(t, "steps_per_call", 0) or 0)

        def run_epoch(state, step_fn, args, beta, nb):
            if spc <= 0 or spc >= nb:
                return step_fn(state, *args, beta)
            loss_sum, n_sum = None, 0
            for i in range(0, nb, spc):
                chunk = tuple(a[i:i + spc] for a in args)
                state, ml = step_fn(state, *chunk, beta)
                n = min(spc, nb - i)
                loss_sum = ml * n if loss_sum is None else loss_sum + ml * n
                n_sum += n
            return state, loss_sum / n_sum

        from ..utils.profiling import trace as _trace

        profile_dir = getattr(t, "profile_dir", None)
        # trace the epoch AFTER the first so the first epoch's compile
        # never pollutes the profile; single-epoch runs trace epoch 0
        profile_ep = (min(start_epoch + 1, t.num_epochs - 1)
                      if profile_dir else None)

        # Device-input epochs prefetch the NEXT epoch's index triples
        # right after dispatching the current one, so the host rng draw
        # and the three (batches, B) int32 transfers (~10 MB/epoch at
        # bench shapes — ~0.2 s through a remote-tunnel link) overlap
        # device compute instead of serializing after the loss sync.
        # The rng call order is unchanged (one sample_indices_fast per
        # epoch, in epoch order), so the sample stream and the
        # trajectory-exact resume fast-forward above are untouched; a
        # draw prefetched past an early stop or preemption is simply
        # dropped with the process's rng.
        def _device_indices():
            si, st_, ln = sampler.sample_indices_fast(
                t.batch_size, num_batches)
            return (jnp.asarray(si), jnp.asarray(st_), jnp.asarray(ln))

        prefetched = None
        history = []
        with _sigterm_flag() as preempted:
            for ep in range(start_epoch, t.num_epochs):
                beta = beta_schedule(ep, t.num_epochs, t.beta_warmup)
                profiling = ep == profile_ep
                with _trace(profile_dir) if profiling \
                        else contextlib.nullcontext():
                    if device_input:
                        args = (prefetched if prefetched is not None
                                else _device_indices())
                        prefetched = None
                        state, mean_loss = run_epoch(
                            state, gstep, args,
                            jnp.float32(beta), num_batches)
                    else:
                        xs, us, lens = epoch_arrays(dataset, t.batch_size)
                        state, mean_loss = run_epoch(
                            state, epoch_step, (xs, us, lens),
                            jnp.float32(beta), xs.shape[0])
                    if profiling:
                        # the epoch step is async; sync INSIDE the trace
                        # so the device work lands in the captured window
                        mean_loss.block_until_ready()
                if device_input and ep + 1 < t.num_epochs:
                    # overlap the next epoch's host draw + transfer with
                    # the (async, still running) epoch just dispatched;
                    # kept outside the profiler window so traces show
                    # only device work
                    prefetched = _device_indices()
                at_save = t.save_freq and (ep + 1) % t.save_freq == 0
                if log_fn is not None or at_save or patience > 0:
                    # the host sync is only needed for live logging,
                    # checkpoint metadata, and early stopping; with none
                    # of those, epochs pipeline (a per-epoch float()
                    # serializes dispatch, ~2x wall through a
                    # high-latency tunnel — CLAUDE.md)
                    loss = float(mean_loss)
                    history.append(loss)
                else:
                    history.append(mean_loss)  # device scalar, no sync
                if log_fn:
                    log_fn(f"Epoch {ep + 1}/{t.num_epochs}, "
                           f"Loss: {loss:.4f}")
                vloss = None
                if val_loss_fn is not None and (patience > 0
                                                or log_fn is not None):
                    vloss = float(val_loss_fn(state.params))
                    if log_fn:
                        log_fn(f"  ValLoss: {vloss:.4f}")
                if patience > 0:
                    metric = vloss if vloss is not None else loss
                    if metric < best_loss - min_delta:
                        best_loss, wait = metric, 0
                    else:
                        wait += 1
                if at_save:
                    save_checkpoint(periodic, state,
                                    metadata={"epoch": ep + 1,
                                              "loss": loss,
                                              "best_loss": best_loss,
                                              "wait": wait})
                if preempted:
                    # preemption-safe exit: checkpoint THIS epoch
                    # boundary (the same resume point a periodic save
                    # makes, so the resumed trajectory is identical) and
                    # return before the process is killed.  The flag
                    # tells callers the state is partial.
                    self.preempted = True
                    save_checkpoint(periodic, state, metadata={
                        "epoch": ep + 1, "loss": float(mean_loss),
                        "best_loss": best_loss, "wait": wait,
                        "preempted": True})
                    if log_fn:
                        log_fn(f"SIGTERM: checkpointed epoch {ep + 1}/"
                               f"{t.num_epochs}; rerun to auto-resume")
                    return state
                if patience > 0 and wait >= patience:
                    if log_fn:
                        log_fn(f"Early stop at epoch {ep + 1}/"
                               f"{t.num_epochs}: no improvement > "
                               f"{min_delta} for {patience} epochs "
                               f"(best {best_loss:.4f})")
                    break

        history = [float(l) for l in history]
        epochs_run = start_epoch + len(history)
        ckpt_path = os.path.join(t.checkpoint_dir, "vae_hmm_trained")
        save_checkpoint(ckpt_path, state,
                        metadata={"epochs": epochs_run,
                                  "early_stopped":
                                      epochs_run < t.num_epochs,
                                  "final_loss": history[-1]
                                  if history else None})
        save_params_npz(os.path.join(t.checkpoint_dir,
                                     "vae_hmm_trained.npz"), state.params)
        if log_fn:
            log_fn(f"Saved checkpoint to {ckpt_path}")
        return state


def main(argv: Optional[list] = None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m vqvaehmm_tpu.train.pipeline "
              "<config.json|yaml> [section.key=value ...]")
        return 1
    cfg = load_config(argv[0])
    if len(argv) > 1:
        cfg = apply_overrides(cfg, argv[1:])
    pipe = TrainPipeline(cfg)
    pipe.train()
    # EX_TEMPFAIL: a preempted run is not a finished run — supervisors
    # keying off the exit code must not treat it as success (rerunning
    # auto-resumes)
    return 75 if pipe.preempted else 0


if __name__ == "__main__":
    sys.exit(main())
