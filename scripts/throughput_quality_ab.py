"""Does the throughput config train models as good as the parity config?

Round-3 VERDICT item 4: the 756k seqs/s headline runs bf16 + fused +
device input, but model-quality evidence for that path was per-step
rel-diff only.  This script trains the recipe's fixture quality config
(40 epochs @ lr=1e-3, B=64 — scripts/full_recipe.py::_recipe_config)
TWICE on the same data and seed:

  parity      f32 params+compute, matmul_precision=highest, XLA step,
              host input pipeline (the <=1e-4-vs-torch-oracle config)
  throughput  bf16 compute, default matmul precision, fused Pallas
              step, device input pipeline (the bench headline config)

and evaluates BOTH final checkpoints under the SAME parity-config model
(f32/highest) on the full fixture panel: final negative ELBO + regime
recovery (smoothed argmax / Viterbi best-perm accuracy vs the fixture's
ground-truth labels).  Output: artifacts/throughput_quality_ab.json,
summarized in BENCH_NOTES.md "Throughput-config quality A/B".

Run ON TPU after `full_recipe.py --stage data`:
    python scripts/throughput_quality_ab.py
(reference training loop this pins: VQ_VAE_HMM_fixed.py:145-162)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from full_recipe import _best_perm_acc, _recipe_config  # noqa: E402

OUTDIR = "artifacts"


def run_variant(tag, model_over, train_over, log):
    import jax

    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg = _recipe_config(OUTDIR, quality=True)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, **model_over),
        training=dataclasses.replace(
            cfg.training, save_freq=0,
            checkpoint_dir=os.path.join("/tmp", "ab_ck_" + tag),
            **train_over))

    history = []

    def log_fn(msg):
        if msg.startswith("Epoch"):
            history.append(float(msg.rsplit(" ", 1)[-1]))
        log(f"[{tag}] {msg}")

    t0 = time.time()
    state = TrainPipeline(cfg).train(log_fn=log_fn)
    wall = time.time() - t0
    # evaluate under the parity model regardless of how we trained
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), state.params)
    return params, history, wall


def evaluate(params, log):
    import jax.numpy as jnp

    from vqvaehmm_tpu.models.vae_hmm import VAEHMM

    cfg = _recipe_config(OUTDIR, quality=True)
    model = VAEHMM(cfg.model)  # parity defaults: f32 / highest
    d = os.path.join(OUTDIR, "data")
    x = jnp.asarray(np.load(os.path.join(d, "x_sequences.npy")))
    u = jnp.asarray(np.load(os.path.join(d, "u_sequences.npy")))
    z = np.load(os.path.join(d, "z_windows.npy"))
    lengths = jnp.full((x.shape[0],), x.shape[2], jnp.int32)

    elbo = float(model.compute_loss(params, x, u, lengths, beta=1.0))
    gamma = np.asarray(model.smoothed_posterior(params, x, u))
    vit = np.asarray(model.viterbi_decode(params, x, u, lengths))
    zf = z.reshape(-1)
    out = {"final_neg_elbo_full_panel_f32": round(elbo, 6)}
    for name, pred in [("smoothed_argmax", gamma.argmax(1)),
                       ("viterbi", vit)]:
        acc, _ = _best_perm_acc(pred.reshape(-1), zf)
        out["regime_acc_" + name] = round(acc, 4)
        out["switch_rate_" + name] = round(
            float((np.diff(pred, axis=1) != 0).mean()), 4)
    log(f"  eval: {json.dumps(out)}")
    return out


def main():
    import jax

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    variants = {
        "parity": (
            dict(compute_dtype="float32", matmul_precision="highest"),
            dict(fused=False, input_pipeline="host"),
        ),
        "throughput": (
            dict(compute_dtype="bfloat16", matmul_precision="default"),
            dict(fused="auto", input_pipeline="auto"),
        ),
    }
    out = {"backend": jax.default_backend(), "config":
           "quality recipe (40 epochs @ lr=1e-3, B=64, seed=42)"}
    for tag, (mo, to) in variants.items():
        log(f"=== {tag}: model={mo} training={to} ===")
        params, history, wall = run_variant(tag, mo, to, log)
        out[tag] = {"model_overrides": mo,
                    "train_overrides": {k: str(v) for k, v in to.items()},
                    "wall_seconds": round(wall, 1),
                    "final_train_loss": round(history[-1], 6) if history
                    else None,
                    **evaluate(params, log)}
    pa, th = out["parity"], out["throughput"]
    out["deltas"] = {
        "neg_elbo": round(th["final_neg_elbo_full_panel_f32"]
                          - pa["final_neg_elbo_full_panel_f32"], 6),
        "regime_acc_viterbi": round(th["regime_acc_viterbi"]
                                    - pa["regime_acc_viterbi"], 4),
        "regime_acc_smoothed_argmax": round(
            th["regime_acc_smoothed_argmax"]
            - pa["regime_acc_smoothed_argmax"], 4),
    }
    with open(os.path.join(OUTDIR, "throughput_quality_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
