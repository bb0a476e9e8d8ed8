"""First-class pipeline for the true-VQ family (model.family: vqvae).

The reference repo is *named* VQ-VAE-HMM but ships only a mean-field VAE;
actual vector quantization exists there as a design sketch
(reference: pseudocode.txt:1-32).  models/vqvae_hmm.py implements the
sketch; this module gives it the same production plumbing the VAE family
has: config-driven training through TrainPipeline, a single portable
checkpoint archive (VQ params + the fitted code-HMM in one .npz, the
same pattern as train/gmm_pipeline.py), and the inference surface the
serving stack binds to (codes + regime posteriors).

Train -> archive -> serve:

    python -m vqvaehmm_tpu.train.pipeline cfg.json model.family=vqvae
    # -> <checkpoint_dir>/vq_stack.npz
    python -m vqvaehmm_tpu.serve.cli --stack vq --checkpoint .../vq_stack.npz
    # HTTP: checkpoint_path -> the archive; /infer returns codes +
    # regime_probs on all three surfaces (serve/vq.py)

The regime HMM has `model.K` states (the same regime count as the VAE
family) with categorical emissions over `vq.num_codes` code symbols,
fit by multi-restart Baum-Welch after VQ training
(models/hmm.fit_categorical_em — the sketch's `hmm.train_em(all_code_
indices)`, pseudocode.txt:26-27).
"""

from __future__ import annotations

import json
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..data.dataset import RandomChunkDataset
from ..models.hmm import CategoricalEmission, HiddenMarkovModel
from ..models.vqvae_hmm import VQVAEConfig, VQVAEHMM
from .trainer import (TrainState, _apply_grads, make_optimizer,
                      resolve_input_pipeline)


def make_vq_model(cfg: Config) -> VQVAEHMM:
    """VQVAEHMM from the unified config: encoder/decoder widths from the
    `model` section, VQ hyperparameters from the `vq` section."""
    m, v = cfg.model, cfg.vq
    return VQVAEHMM(VQVAEConfig(
        input_dim=m.input_dim, hidden_dim=m.hidden_dim,
        hidden_dim2=m.hidden_dim2, num_codes=v.num_codes,
        latent_dim=v.latent_dim, commitment_beta=v.commitment_beta))


def panel_windows(x_seqs, max_len: int,
                  min_len: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic full-coverage windows of a sequence pool: each
    source sequence split into consecutive max_len windows (tail kept
    when >= min_len), zero-padded to max_len.  Returns
    (x:(N,C,max_len) f32, lengths:(N,) i32) — the panel the code-HMM is
    fit on (training batches are random chunks; the HMM fit wants every
    timestep exactly once)."""
    C = x_seqs[0].shape[0]
    xs, lens = [], []
    for s in x_seqs:
        s = np.asarray(s, np.float32)
        for start in range(0, s.shape[1], max_len):
            w = s[:, start:start + max_len]
            if w.shape[1] < min_len and start > 0:
                break
            pad = np.zeros((C, max_len), np.float32)
            pad[:, :w.shape[1]] = w
            xs.append(pad)
            lens.append(w.shape[1])
    return np.stack(xs), np.asarray(lens, np.int32)


def make_vq_epoch_step(model: VQVAEHMM, tx, donate: bool = True,
                       codebook_lr_scale: float = 1.0):
    """Whole-epoch VQ update: lax.scan over a stacked epoch of batches,
    one dispatch + one host sync per epoch (the same execution model as
    the VAE family's make_epoch_step).

    codebook_lr_scale: multiplies the codebook's post-optimizer UPDATE
    (vq.codebook_lr_scale) — the separate-codebook-lr knob without a
    second optimizer.  It must act on the update, not the gradient:
    Adam normalizes each parameter's step by its own gradient scale
    (m_hat/sqrt(v_hat)), so a constant pre-optimizer gradient scale
    cancels to eps-level noise.  Scaling the update is exactly
    `optax.scale` applied to one leaf: 0.0 freezes the codebook,
    0.5/2.0 genuinely halve/double its effective learning rate while
    the moment estimates stay those of the unscaled gradient."""

    def epoch(state: TrainState, xs, lens):
        def body(st, batch):
            x, l = batch

            def loss_fn(p):
                parts = model.compute_loss(p, x, l)
                return parts.total, parts.counts

            (loss, counts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            if codebook_lr_scale == 1.0:
                return _apply_grads(tx, st, grads), (loss, counts)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            updates = {**updates,
                       "codebook": updates["codebook"] * codebook_lr_scale}
            params = optax.apply_updates(st.params, updates)
            return (TrainState(params, opt_state, st.step + 1),
                    (loss, counts))

        state, (losses, counts) = jax.lax.scan(body, state, (xs, lens))
        # epoch-total per-code usage rides the same dispatch as the loss
        return state, losses.mean(), counts.sum(0)

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_code_reinit(model: VQVAEHMM):
    """Jitted dead-code restart: replace codebook rows flagged in
    `dead` with encoder latents of the given VALID (row, t) positions —
    the standard revival move for gradient-VQ collapse (a dead code
    receives exactly zero gradient, so nothing else can ever move it).
    Also used for data-dependent init (dead = all ones)."""

    @jax.jit
    def reinit(params, x, rows, ts, dead):
        z_e = model.encode(params, x)                  # (B, D, T)
        samples = z_e[rows, :, ts]                     # (num_codes, D)
        cb = jnp.where(dead[:, None], samples.astype(params["codebook"].dtype),
                       params["codebook"])
        return {**params, "codebook": cb}

    return reinit


def _sample_valid_positions(rng, lens_np, n):
    """n random (row, t) pairs with t < lens[row] (host-side)."""
    rows = rng.integers(0, len(lens_np), size=n)
    ts = (rng.random(n) * lens_np[rows]).astype(np.int32)
    return rows.astype(np.int32), ts


class VQStack(NamedTuple):
    """Trained VQ-VAE + fitted code-HMM, the unit the pipeline
    checkpoints and serving loads (one .npz archive, no pickle — the
    same portability contract as train/gmm_pipeline.ImprovedSystem)."""

    model: VQVAEHMM
    params: Dict
    hmm: HiddenMarkovModel
    history: list
    # per-code assignment share on the full panel at fit time (None for
    # archives written before this field / demo stacks); serving and the
    # recipe read it instead of recomputing
    usage: Optional[list] = None

    # -- inference ----------------------------------------------------

    def codes(self, x) -> jnp.ndarray:
        """(B, T) discrete code indices (nearest-code lookup)."""
        return self.model.codes(self.params, jnp.asarray(x))

    def _log_obs(self, codes) -> jnp.ndarray:
        return self.hmm.emission.log_prob(jnp.asarray(codes))

    def regime_marginals(self, x, lengths=None,
                         mode: str = "smoothed") -> jnp.ndarray:
        """(B, T, K) exact regime posteriors over the code sequence:
        'smoothed' (all-data) or 'filtered' (causal)."""
        from ..ops import hmm as hmm_ops

        if mode not in ("smoothed", "filtered"):
            raise ValueError(f"unknown mode {mode!r}")
        log_obs = self._log_obs(self.codes(x))
        fn = (hmm_ops.posterior_marginals if mode == "smoothed"
              else hmm_ops.filtered_marginals)
        return fn(self.hmm.log_pi, self.hmm.log_A, log_obs, lengths)

    def viterbi(self, x, lengths=None) -> jnp.ndarray:
        """(B, T) MAP regime path over the code sequence."""
        return self.hmm.posterior_mode(self.codes(x), lengths)

    # -- persistence ----------------------------------------------------

    def save(self, path: str) -> None:
        cfg = self.model.cfg
        leaves, _ = jax.tree_util.tree_flatten(self.params)
        arrays = {f"vq_{i}": np.asarray(a) for i, a in enumerate(leaves)}
        meta = {
            "family": "vqvae",
            "model": {"input_dim": cfg.input_dim,
                      "hidden_dim": cfg.hidden_dim,
                      "hidden_dim2": cfg.hidden_dim2,
                      "num_codes": cfg.num_codes,
                      "latent_dim": cfg.latent_dim,
                      "commitment_beta": cfg.commitment_beta},
            "K": int(self.hmm.K),
            "codebook_usage": self.usage,
        }
        # write-then-rename so a kill mid-write can never leave a
        # truncated archive at the published path (np.savez appends
        # .npz when missing, so normalize first)
        final = path if path.endswith(".npz") else path + ".npz"
        tmp = final + ".tmp.npz"
        np.savez(tmp,
                 meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
                 hmm_log_pi=np.asarray(self.hmm.log_pi),
                 hmm_log_A=np.asarray(self.hmm.log_A),
                 hmm_log_B=np.asarray(self.hmm.emission.logits),
                 history=np.asarray(self.history, np.float64),
                 **arrays)
        os.replace(tmp, final)

    @classmethod
    def load(cls, path: str) -> "VQStack":
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if meta.get("family") != "vqvae":
                raise ValueError(f"{path!r} is not a vq_stack archive")
            m = meta["model"]
            model = VQVAEHMM(VQVAEConfig(
                input_dim=m["input_dim"], hidden_dim=m["hidden_dim"],
                hidden_dim2=m["hidden_dim2"], num_codes=m["num_codes"],
                latent_dim=m["latent_dim"],
                commitment_beta=m["commitment_beta"]))
            n = sum(1 for k in z.files if k.startswith("vq_"))
            leaves = [jnp.asarray(z[f"vq_{i}"]) for i in range(n)]
            log_pi = jnp.asarray(z["hmm_log_pi"])
            log_A = jnp.asarray(z["hmm_log_A"])
            log_B = jnp.asarray(z["hmm_log_B"])
            history = z["history"].tolist()
        template = model.init(jax.random.PRNGKey(0))
        treedef = jax.tree_util.tree_structure(template)
        if len(leaves) != treedef.num_leaves:
            raise ValueError(
                f"archive {path!r} holds {len(leaves)} arrays but the "
                f"current VQVAEHMM has {treedef.num_leaves}")
        for a, b in zip(leaves, jax.tree_util.tree_leaves(template)):
            if a.shape != b.shape:
                raise ValueError(
                    f"archive {path!r} leaf shape {a.shape} != model "
                    f"shape {b.shape} — config/archive mismatch")
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        hmm = HiddenMarkovModel(jnp.exp(log_pi), jnp.exp(log_A),
                                CategoricalEmission(log_B))
        # overwrite the probs->log roundtrip with the saved logs so a
        # save/load cycle is bit-exact
        hmm.log_pi, hmm.log_A = log_pi, log_A
        return cls(model, params, hmm, history,
                   usage=meta.get("codebook_usage"))


def train_vq_stack(cfg: Config, dataset: RandomChunkDataset,
                   log_fn=print, resume: bool = True,
                   checkpoint_dir: Optional[str] = None
                   ) -> Tuple[Optional[VQStack], TrainState, bool]:
    """Config-driven VQ training + code-HMM fit.

    Training knobs honoured from cfg.training: num_epochs,
    learning_rate, batch_size, gradient_clip, seed, input_pipeline
    ('auto' -> device epoch assembly on TPU, data/device_sampler.py),
    save_freq (periodic `vq_periodic` checkpoint with auto-resume), and
    the SIGTERM preemption protocol (checkpoint the epoch boundary and
    return) — the same contract TrainPipeline.train documents for the
    VAE family.  Resume is trajectory-exact: the dataset rng is
    fast-forwarded by the consumed per-epoch draws and the dead-code
    restart rng state rides the checkpoint metadata verbatim.

    The HMM is fit afterwards on deterministic full-coverage windows of
    the source pool (panel_windows) with cfg.model.K regime states over
    cfg.vq.num_codes code symbols.

    Returns (stack, state, preempted); stack is None when preempted
    (the HMM fit is skipped — a rerun resumes and completes it)."""
    t, v = cfg.training, cfg.vq
    model = make_vq_model(cfg)
    tx = make_optimizer(t.learning_rate, t.gradient_clip)
    params = model.init(jax.random.PRNGKey(t.seed))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    epoch_step = make_vq_epoch_step(
        model, tx,
        codebook_lr_scale=float(getattr(v, "codebook_lr_scale", 1.0)))

    device_input = resolve_input_pipeline(
        getattr(t, "input_pipeline", "auto")) == "device"
    sampler = None
    if device_input:
        from ..data.device_sampler import DeviceEpochSampler

        sampler = DeviceEpochSampler(dataset)
    num_batches = len(dataset) // t.batch_size

    reinit = make_code_reinit(model)
    rng = np.random.default_rng(t.seed + 1)

    from ..data.checkpoint import (load_checkpoint, load_metadata,
                                   save_checkpoint)
    from .pipeline import _sigterm_flag

    save_freq = int(getattr(t, "save_freq", 0) or 0)
    periodic = (os.path.join(checkpoint_dir, "vq_periodic")
                if checkpoint_dir else None)
    start_epoch, history = 0, []
    meta = (load_metadata(periodic)
            if resume and periodic is not None else None)
    if meta is not None and os.path.exists(periodic):
        state = load_checkpoint(periodic, state)
        start_epoch = int(meta.get("epoch", 0))
        history = [float(l) for l in meta.get("history", [])]
        # the restart rng's draw count is data-dependent (one draw per
        # epoch WITH dead codes), so replaying is impossible — the
        # serialized bit-generator state resumes it exactly instead
        if meta.get("rng_state") is not None:
            rng.bit_generator.state = meta["rng_state"]
        if log_fn:
            log_fn(f"Resumed from epoch {start_epoch} "
                   f"(step {int(state.step)})")
        # fast-forward the stateful data stream (same invariant as the
        # VAE branch: resume is trajectory-exact, not distribution-exact)
        from ..data.dataset import epoch_skip

        for _ in range(start_epoch):
            if sampler is not None:
                sampler.sample_indices_fast(t.batch_size, num_batches)
            else:
                epoch_skip(dataset, t.batch_size)

    def draw_epoch():
        if sampler is not None:
            # on-device epoch assembly: the host ships index triples,
            # the gather runs on-chip (the VQ loss needs x only; the
            # sampler's u gather is the cost of sharing one code path)
            return sampler.epoch(t.batch_size, num_batches,
                                 exact_stream=False)
        from ..data.dataset import epoch_arrays

        return epoch_arrays(dataset, t.batch_size)

    def restart_dead(state, counts, xs, lens, tag):
        """Host-side dead-code check + jitted restart; returns
        (state, n_restarted)."""
        c = np.asarray(counts)
        dead = c < max(1.0, v.dead_code_min_usage * c.sum() / v.num_codes)
        if not dead.any():
            return state, 0
        rows, ts = _sample_valid_positions(
            rng, np.asarray(lens[0]), v.num_codes)
        state = state._replace(params=reinit(
            state.params, xs[0], jnp.asarray(rows), jnp.asarray(ts),
            jnp.asarray(dead)))
        if log_fn is not None:
            log_fn(f"  restarted {int(dead.sum())} dead codes{tag} "
                   f"(usage {np.array2string(c, precision=0)})")
        return state, int(dead.sum())

    counts = None
    preempted = False
    already_polished = bool(meta.get("polished")) if meta else False
    xs = lens = None

    def panel_codes_and_counts(params):
        """Codes + per-code assignment counts over the VALID timesteps
        of the full panel — the same criterion the archive's usage
        audit ships with, so polish and the final warning agree."""
        xw, lw = panel_windows(dataset.x_seqs, dataset.max_len)
        codes = model.codes(params, jnp.asarray(xw))
        codes_np = np.asarray(codes)
        pmask = (np.arange(codes_np.shape[1])[None, :]
                 < np.asarray(lw)[:, None])
        pc = np.bincount(codes_np[pmask].reshape(-1),
                         minlength=v.num_codes)
        return lw, codes, pc

    # The SIGTERM window covers the whole run INCLUDING the polish tail
    # (a spot-VM reclaim during the post-training stages must not
    # hard-kill the process mid-write).
    with _sigterm_flag() as sig:
        for ep in range(start_epoch, t.num_epochs):
            xs, _, lens = draw_epoch()
            if ep == 0 and v.data_init:
                # data-dependent codebook init: codes start ON the latent
                # manifold (random-normal init left 7/8 codes dead on the
                # market fixture — nothing revives a code that never wins
                # an assignment)
                rows, ts = _sample_valid_positions(
                    rng, np.asarray(lens[0]), v.num_codes)
                state = state._replace(params=reinit(
                    state.params, xs[0], jnp.asarray(rows),
                    jnp.asarray(ts), jnp.ones((v.num_codes,), bool)))
            state, mean_loss, counts = epoch_step(state, xs, lens)
            if v.dead_code_reinit and ep < t.num_epochs - 1:
                # per-epoch host fetch of (num_codes,) counts; restart
                # codes below dead_code_min_usage of a uniform share.
                # This serializes dispatch between epochs — the VQ family
                # trades that for codebook health (~ms/epoch here).
                state, _ = restart_dead(state, counts, xs, lens, "")
            at_save = save_freq and (ep + 1) % save_freq == 0
            if log_fn is not None or at_save or sig:
                loss = float(mean_loss)
                history.append(loss)
                if log_fn is not None:
                    log_fn(f"Epoch {ep + 1}/{t.num_epochs}, "
                           f"Loss: {loss:.4f}")
            else:
                # device scalar: epochs pipeline (a per-epoch float()
                # fetch serializes dispatch through the tunnel)
                history.append(mean_loss)
            if (at_save or sig) and periodic is not None:
                save_checkpoint(periodic, state, metadata={
                    "epoch": ep + 1, "loss": loss,
                    "history": [float(l) for l in history],
                    "rng_state": rng.bit_generator.state,
                    "preempted": bool(sig)})
            if sig:
                if log_fn:
                    log_fn(f"SIGTERM: checkpointed epoch {ep + 1}/"
                           f"{t.num_epochs}; rerun to auto-resume")
                preempted = True
                break
        if preempted:
            return None, state, True

        # Final-epoch codebook polish: the in-loop restarts deliberately
        # skip the last epoch (a freshly reinitialized code would ship
        # untrained), but skipping silently can ship a near-dead code
        # instead.  The polish criterion is the PANEL usage — the number
        # the archive ships with — so it is well-defined on every path,
        # including a resume that lands past the last training epoch.
        # If the shipping usage has sub-threshold codes, restart them
        # and train up to `final_polish_epochs` extra epochs; remaining
        # dead codes are recorded (and warned about) via
        # `codebook_usage`.
        polish_done = 0
        max_polish = int(getattr(v, "final_polish_epochs", 1) or 0)
        lw, codes, pc = panel_codes_and_counts(state.params)
        if v.dead_code_reinit and max_polish and not already_polished:
            if xs is None:
                # resumed past the last epoch: draw a batch stream for
                # the restart latents / polish training
                xs, _, lens = draw_epoch()
            for _ in range(max_polish):
                state2, n = restart_dead(state, pc, xs, lens,
                                         " (final polish)")
                if n == 0:
                    break
                xs, _, lens = draw_epoch()
                state2, mean_loss, _ = epoch_step(state2, xs, lens)
                state, polish_done = state2, polish_done + 1
                history.append(float(mean_loss))
                if log_fn is not None:
                    log_fn(f"Polish epoch {polish_done}/{max_polish}, "
                           f"Loss: {float(history[-1]):.4f}")
                lw, codes, pc = panel_codes_and_counts(state.params)
                if sig:
                    break
            if polish_done and periodic is not None \
                    and os.path.exists(periodic):
                # the periodic checkpoint now predates the polish;
                # overwrite it with the post-polish state so a rerun of
                # the completed command republishes the SAME archive
                # (idempotent) instead of an unpolished one
                save_checkpoint(periodic, state, metadata={
                    "epoch": t.num_epochs,
                    "history": [float(l) for l in history],
                    "rng_state": rng.bit_generator.state,
                    "preempted": bool(sig), "polished": not sig})
            if sig:
                if log_fn:
                    log_fn("SIGTERM during final polish: checkpointed; "
                           "rerun to finish the polish and publish")
                return None, state, True

        # Baum-Welch over the code indices of the full pool
        # (pseudocode.txt:26-27), K regimes x num_codes symbols — still
        # inside the SIGTERM window: a reclaim during the (expensive)
        # multi-restart fit must not hard-kill the process; the fit
        # completes and the caller publishes atomically.
        from ..models.hmm import fit_categorical_em

        em = fit_categorical_em(codes, K=cfg.model.K, V=v.num_codes,
                                n_iters=v.hmm_iters, seed=t.seed,
                                lengths=jnp.asarray(lw),
                                n_init=v.hmm_restarts,
                                sticky=v.hmm_sticky)
    if log_fn:
        log_fn(f"code-HMM EM: final loglik "
               f"{float(np.asarray(em.log_likelihoods)[-1]):.2f} "
               f"({v.hmm_restarts} restarts, {v.hmm_iters} iters)")
    # final codebook health: the panel usage share the archive ships
    # with (padding excluded) — pc comes from the post-polish params
    usage = pc / max(1, pc.sum())
    thresh = v.dead_code_min_usage / v.num_codes
    low = [i for i, s in enumerate(usage) if s < thresh]
    if low and log_fn:
        log_fn(f"WARNING: codebook ships {len(low)} code(s) below the "
               f"dead-code threshold ({thresh:.4f}): "
               f"{[(i, round(float(usage[i]), 4)) for i in low]} — "
               f"consider raising vq.final_polish_epochs or lowering "
               f"vq.num_codes")
    history = [float(l) for l in history]  # may hold device scalars
    stack = VQStack(model, state.params, em.model, history,
                    usage=[round(float(s), 4) for s in usage])
    return stack, state, False


def train_vq_pipeline(pipeline, log_fn=print,
                      resume: bool = True) -> TrainState:
    """TrainPipeline's vqvae branch: train (resumable, periodic
    checkpoints, SIGTERM-safe), fit the HMM, write the archive to
    <checkpoint_dir>/vq_stack.npz.  Returns the final TrainState (params
    are the VQ params) so the pipeline's return contract holds for both
    families; sets pipeline.preempted (and skips the archive write) when
    SIGTERM interrupted the run."""
    cfg = pipeline.cfg
    dataset = pipeline.load_data()
    os.makedirs(cfg.training.checkpoint_dir, exist_ok=True)
    stack, state, preempted = train_vq_stack(
        cfg, dataset, log_fn=log_fn, resume=resume,
        checkpoint_dir=cfg.training.checkpoint_dir)
    pipeline.preempted = preempted
    if preempted:
        return state
    path = os.path.join(cfg.training.checkpoint_dir, "vq_stack.npz")
    stack.save(path)
    if log_fn:
        log_fn(f"Saved VQ stack to {path}")
    return state
