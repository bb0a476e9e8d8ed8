"""Round-4 VERDICT item 5: test the VQ family's "structural ceiling"
claim instead of asserting it.

The committed VQ quality row (balanced acc 0.516 smoothed / 0.498
Viterbi vs the VAE's 0.577/0.522) was attributed to a structural
limitation of the two-stage design ("the VQ objective never sees
regimes") without a hyperparameter sweep or a joint-training attempt.
This script measures both:

  sweep   num_codes x commitment_beta grid + codebook_lr_scale
          variants at the default point, 40-epoch fixture runs through
          the SAME train_vq_stack the pipeline uses, scored on the same
          windows/ground truth as every other quality artifact.
  joint   a joint-finetune attempt: after the standard two-stage run,
          alternate (a) fit the code-HMM, (b) finetune encoder+codebook
          with an added HMM-consistency term — cross-entropy between
          the soft code assignment softmax(-d^2/tau) and the fitted
          HMM's smoothed predictive code distribution (stop-gradient),
          i.e. the temporal model finally talks back to the encoder —
          then refit and score.  (The reference sketch is strictly
          two-stage, pseudocode.txt:1-32; this tests whether the
          ceiling is the two-stageness.)

Output: artifacts/vq_sweep.json.  Run ON TPU after
`full_recipe.py --stage data`:
    python scripts/vq_sweep.py [--stage all] [--epochs 40]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from full_recipe import _balanced_acc, _best_perm_acc  # noqa: E402

OUTDIR = "artifacts"
ARTIFACT = os.path.join(OUTDIR, "vq_sweep.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def base_config(epochs, num_codes=8, commitment=0.25, lr_scale=1.0,
                tag="pt", seed=42):
    from vqvaehmm_tpu.core.config import (Config, DataConfig, ModelConfig,
                                          TrainConfig, VQConfig)

    d = os.path.join(OUTDIR, "data")
    return Config(
        model=ModelConfig(input_dim=5, hidden_dim=64, K=3, hidden_dim2=32,
                          u_dim=4, trans_hidden=128, family="vqvae"),
        vq=VQConfig(num_codes=num_codes, latent_dim=16,
                    commitment_beta=commitment,
                    codebook_lr_scale=lr_scale),
        data=DataConfig(min_len=20, max_len=200,
                        x_sequences_path=os.path.join(d, "x_sequences.npy"),
                        u_sequences_path=os.path.join(d, "u_sequences.npy")),
        training=TrainConfig(batch_size=64, num_epochs=epochs,
                             learning_rate=3e-3, seed=seed, save_freq=0,
                             checkpoint_dir=os.path.join("/tmp",
                                                         f"vqsw_{tag}")),
    )


def score_stack(stack, x, z_w):
    import jax.numpy as jnp

    lens = jnp.full((x.shape[0],), x.shape[2], jnp.int32)
    gamma = np.asarray(stack.regime_marginals(x, lens))  # (N,T,K)
    vit = np.asarray(stack.viterbi(x, lens))
    zf = z_w.reshape(-1)
    out = {}
    for name, pred in [("smoothed", gamma.argmax(-1)), ("viterbi", vit)]:
        acc, perm = _best_perm_acc(pred.reshape(-1), zf)
        out[f"acc_{name}"] = round(acc, 4)
        out[f"bal_acc_{name}"] = round(
            _balanced_acc(pred.reshape(-1), zf, perm), 4)
        out[f"switch_{name}"] = round(
            float((np.diff(pred, axis=1) != 0).mean()), 4)
    out["codebook_usage"] = stack.usage
    return out


_POINT_CACHE = {}


def run_point(epochs, num_codes, commitment, lr_scale, tag, seed=42):
    import jax.numpy as jnp

    from vqvaehmm_tpu.train.pipeline import TrainPipeline
    from vqvaehmm_tpu.train.vq_pipeline import train_vq_stack

    # the default operating point appears in the sweep grid AND as the
    # joint stage's base (once per lam value) — train it once
    key = (epochs, num_codes, commitment, lr_scale, seed)
    if key in _POINT_CACHE:
        log(f"[{tag}] reusing already-trained point {key}")
        return _POINT_CACHE[key]

    cfg = base_config(epochs, num_codes, commitment, lr_scale, tag, seed)
    dataset = TrainPipeline(cfg).load_data()
    t0 = time.time()
    stack, state, _ = train_vq_stack(cfg, dataset, log_fn=None,
                                     resume=False, checkpoint_dir=None)
    wall = time.time() - t0
    d = os.path.join(OUTDIR, "data")
    x = jnp.asarray(np.load(os.path.join(d, "x_sequences.npy")))
    z_w = np.load(os.path.join(d, "z_windows.npy"))
    row = {"num_codes": num_codes, "commitment_beta": commitment,
           "codebook_lr_scale": lr_scale, "seed": seed,
           "wall_seconds": round(wall, 1),
           "final_vq_loss": round(stack.history[-1], 4),
           **score_stack(stack, x, z_w)}
    log(f"[{tag}] {json.dumps(row)}")
    _POINT_CACHE[key] = (row, stack, state, cfg, dataset)
    return row, stack, state, cfg, dataset


def stage_sweep(epochs):
    rows = []
    for num_codes in (4, 8, 16):
        for commitment in (0.1, 0.25, 0.5):
            tag = f"n{num_codes}_c{commitment}"
            row, *_ = run_point(epochs, num_codes, commitment, 1.0, tag)
            rows.append(row)
    for lr_scale in (0.5, 2.0):
        tag = f"n8_c0.25_s{lr_scale}"
        row, *_ = run_point(epochs, 8, 0.25, lr_scale, tag)
        rows.append(row)
    best = max(rows, key=lambda r: r["bal_acc_smoothed"])
    return {"epochs": epochs, "grid": rows,
            "best_by_bal_acc_smoothed": best}


def stage_joint(epochs, outer_iters=2, finetune_epochs=10,
                lam=1.0, seed=42):
    """Joint-finetune: does letting the HMM talk back to the encoder
    move the quality ceiling?"""
    import jax
    import jax.numpy as jnp
    import optax

    from vqvaehmm_tpu.models.hmm import fit_categorical_em
    from vqvaehmm_tpu.ops import hmm as hmm_ops
    from vqvaehmm_tpu.train.vq_pipeline import VQStack, panel_windows

    # stage 1: the standard two-stage run (default operating point)
    row0, stack, state, cfg, dataset = run_point(
        epochs, 8, 0.25, 1.0, f"joint_base_s{seed}", seed=seed)
    model, v, t = stack.model, cfg.vq, cfg.training

    xw_np, lw_np = panel_windows(dataset.x_seqs, dataset.max_len)
    xw, lw = jnp.asarray(xw_np), jnp.asarray(lw_np)
    d = os.path.join(OUTDIR, "data")
    x_eval = jnp.asarray(np.load(os.path.join(d, "x_sequences.npy")))
    z_w = np.load(os.path.join(d, "z_windows.npy"))

    tx = optax.chain(
        optax.clip_by_global_norm(float(t.gradient_clip or 1.0)),
        optax.adam(1e-3))
    vmask = (jnp.arange(xw.shape[-1])[None, :] < lw[:, None])

    def finetune_step(params, opt_state, p_code, tau):
        def loss_fn(p):
            parts = model.compute_loss(p, xw, lw)
            z = jnp.transpose(model.encode(p, xw), (0, 2, 1))  # (B,T,D)
            E = p["codebook"]                                   # (V,D)
            d2 = ((z ** 2).sum(-1, keepdims=True)
                  - 2.0 * z @ E.T + (E ** 2).sum(-1)[None, None])
            logq = jax.nn.log_softmax(-d2 / tau, axis=-1)       # (B,T,V)
            ce = -(p_code * logq).sum(-1)                       # (B,T)
            ce = (ce * vmask).sum() / jnp.maximum(vmask.sum(), 1)
            return parts.total + lam * ce, (parts.total, ce)

        (tot, (base, ce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, base, ce

    finetune_step = jax.jit(finetune_step)

    params = state.params
    iters_log = [{"iter": 0, **score_stack(stack, x_eval, z_w)}]
    hmm = stack.hmm
    for it in range(1, outer_iters + 1):
        # (a) HMM's smoothed predictive code distribution over the panel
        codes = model.codes(params, xw)
        log_obs = hmm.emission.log_prob(codes)
        gamma = hmm_ops.posterior_marginals(hmm.log_pi, hmm.log_A,
                                            log_obs, lw)       # (B,T,K)
        B_mat = jnp.exp(hmm.emission.logits)                   # (K,V)
        p_code = jax.lax.stop_gradient(gamma @ B_mat)          # (B,T,V)
        # tau: median squared distance so the soft assignment starts
        # neither saturated nor uniform
        z = jnp.transpose(model.encode(params, xw), (0, 2, 1))
        E = params["codebook"]
        d2 = ((z ** 2).sum(-1, keepdims=True) - 2.0 * z @ E.T
              + (E ** 2).sum(-1)[None, None])
        tau = jnp.maximum(jnp.median(d2), 1e-3)
        # (b) finetune encoder + codebook with the consistency term
        opt_state = tx.init(params)
        for ep in range(finetune_epochs):
            params, opt_state, base, ce = finetune_step(params, opt_state,
                                                        p_code, tau)
        # (c) refit the regime HMM on the new codes
        codes = model.codes(params, xw)
        em = fit_categorical_em(codes, K=cfg.model.K, V=v.num_codes,
                                n_iters=v.hmm_iters, seed=t.seed,
                                lengths=lw, n_init=v.hmm_restarts,
                                sticky=v.hmm_sticky)
        hmm = em.model
        stack = VQStack(model, params, hmm, stack.history, usage=None)
        row = {"iter": it, "vq_loss": round(float(base), 4),
               "hmm_ce": round(float(ce), 4),
               **score_stack(stack, x_eval, z_w)}
        # recompute shipped usage for the log
        cu = np.bincount(np.asarray(codes)[np.asarray(vmask)].reshape(-1),
                         minlength=v.num_codes)
        row["codebook_usage"] = [round(float(s), 4)
                                 for s in cu / max(cu.sum(), 1)]
        log(f"[joint iter {it}] {json.dumps(row)}")
        iters_log.append(row)
    return {"base": row0, "lam": lam, "tau": "median d^2 per iter",
            "outer_iters": outer_iters, "seed": seed,
            "finetune_epochs": finetune_epochs, "iterations": iters_log}


def stage_seeds(epochs, seeds=(42, 43, 44, 45, 46), prior_per_seed=()):
    """Multi-seed the sweep's single-seed headline: does the balanced-acc
    headroom of n8/c0.5 and the joint finetune (lam=0.3) over the default
    operating point survive the fixture's seed lottery?  Same standard the
    round-5 throughput/parity A/B applied: per-seed PAIRED deltas, not one
    draw per arm.  `prior_per_seed`: rows from a previous invocation to
    merge (new seeds extend the study; re-run seeds supersede)."""
    arms = {"default": (8, 0.25), "n8_c0.5": (8, 0.5)}
    per_seed = [r for r in prior_per_seed if r["seed"] not in set(seeds)]
    for seed in seeds:
        row = {"seed": seed}
        for name, (nc, cb) in arms.items():
            r, *_ = run_point(epochs, nc, cb, 1.0,
                              f"seed{seed}_{name}", seed=seed)
            row[name] = {k: r[k] for k in
                         ("acc_smoothed", "bal_acc_smoothed",
                          "switch_smoothed", "acc_viterbi",
                          "bal_acc_viterbi", "switch_viterbi")}
            row[name]["min_usage"] = round(min(r["codebook_usage"]), 4)
        j = stage_joint(epochs, lam=0.3, seed=seed)
        last = j["iterations"][-1]
        row["joint_lam0.3"] = {k: last[k] for k in
                               ("acc_smoothed", "bal_acc_smoothed",
                                "switch_smoothed", "acc_viterbi",
                                "bal_acc_viterbi", "switch_viterbi")}
        log(f"[seeds] {json.dumps(row)}")
        per_seed.append(row)
    per_seed.sort(key=lambda r: r["seed"])

    def dist(arm, key):
        vals = sorted(r[arm][key] for r in per_seed)
        return {"values": vals, "median": vals[len(vals) // 2]}

    def paired(arm, key):
        ds = sorted(round(r[arm][key] - r["default"][key], 4)
                    for r in per_seed)
        return {"deltas": ds, "median": ds[len(ds) // 2]}

    keys = ("bal_acc_smoothed", "bal_acc_viterbi", "acc_smoothed",
            "acc_viterbi", "switch_smoothed", "switch_viterbi")
    return {"epochs": epochs,
            "seeds": sorted(r["seed"] for r in per_seed),
            "per_seed": per_seed,
            "distributions": {a: {k: dist(a, k) for k in keys}
                              for a in ("default", "n8_c0.5",
                                        "joint_lam0.3")},
            "paired_vs_default": {a: {k: paired(a, k) for k in keys}
                                  for a in ("n8_c0.5", "joint_lam0.3")}}


def stage_lrscale(epochs):
    """Re-measure ONLY the codebook_lr_scale grid points and patch them
    into the existing sweep artifact.  Needed once: the original grid ran
    with the pre-2709fa0 knob, which scaled the gradient BEFORE Adam and
    was therefore a no-op beyond eps-level trajectory noise — those two
    rows were effectively different-seed draws of the default, not
    measurements of the knob."""
    rows = []
    for lr_scale in (0.5, 2.0):
        tag = f"n8_c0.25_s{lr_scale}_fixed"
        row, *_ = run_point(epochs, 8, 0.25, lr_scale, tag)
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["sweep", "joint", "seeds", "lrscale", "all"])
    ap.add_argument("--epochs", type=int,
                    default=int(os.environ.get("VQHMM_VQ_EPOCHS", "40")))
    ap.add_argument("--lam", type=float, nargs="+", default=[0.3, 1.0],
                    help="HMM-consistency weights for the joint stage "
                         "(one self-contained run per value)")
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[42, 43, 44, 45, 46],
                    help="seeds for --stage seeds; results merge with "
                         "(and supersede) any already in the artifact")
    args = ap.parse_args()

    out = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            out = json.load(f)
    todo = (["sweep", "joint"] if args.stage == "all" else [args.stage])
    summary = {}
    for s in todo:
        log(f"=== stage: {s} ===")
        if s == "sweep":
            out[s] = stage_sweep(args.epochs)
            summary[s] = out[s]["best_by_bal_acc_smoothed"]
        elif s == "seeds":
            prior = out.get("seeds", {}).get("per_seed", [])
            out[s] = stage_seeds(args.epochs, tuple(args.seeds),
                                 prior_per_seed=prior)
            summary[s] = out[s]["paired_vs_default"]
        elif s == "lrscale":
            new_rows = stage_lrscale(args.epochs)
            grid = out["sweep"]["grid"]
            for nr in new_rows:
                for i, r in enumerate(grid):
                    if (r["num_codes"] == nr["num_codes"]
                            and r["commitment_beta"] == nr["commitment_beta"]
                            and r["codebook_lr_scale"]
                            == nr["codebook_lr_scale"]):
                        grid[i] = nr
            out["sweep"]["best_by_bal_acc_smoothed"] = max(
                grid, key=lambda r: r["bal_acc_smoothed"])
            out["sweep"]["lrscale_note"] = (
                "s0.5/s2.0 rows re-measured with the post-2709fa0 knob "
                "(true post-optimizer update scale); the original rows "
                "were eps-level no-ops of the default")
            summary[s] = new_rows
        else:
            for lam in args.lam:
                key = f"joint_lam{lam}"
                log(f"--- {key} ---")
                out[key] = stage_joint(args.epochs, lam=lam)
                summary[key] = out[key]["iterations"][-1]
                with open(ARTIFACT, "w") as f:
                    json.dump(out, f, indent=2)
        with open(ARTIFACT, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
