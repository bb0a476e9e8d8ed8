"""Where does exact HMM inference beat mean-field argmax?

Sweeps the synthetic generator over regime stickiness x emission SNR,
trains the VAE-HMM per cell, and scores regime recovery for the three
decode modes (mean-field argmax — the reference's only decode,
backtesting.py:155 — vs smoothed posterior vs exact Viterbi).  The
hypothesis (SURVEY.md "HMM inference — critical finding"): smoothing wins
where per-step evidence is weak (high noise) and dynamics are informative
(high stickiness).

Also reports a no-ground-truth stability metric on the reference's shipped
checkpoint when present (/root/reference/models/vae_hmm.pt): regime
switches per 100 steps under each decode — exact inference suppresses the
single-step flickers that argmax produces, which is what a trading system
consumes.

Run: python scripts/quality_sweep.py [--epochs N]   (TPU or CPU)
Prints one JSON line per sweep cell plus a summary table on stderr.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os

# persistent compile cache (CLAUDE.md: remote compiles cost minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def best_perm_accuracy(pred, true, K):
    best = 0.0
    for perm in itertools.permutations(range(K)):
        best = max(best, float((np.asarray(perm)[pred] == true).mean()))
    return best


def switches_per_100(states: np.ndarray) -> float:
    d = (np.diff(states, axis=-1) != 0).mean()
    return float(d * 100)


def run_cell(stickiness, noise_scale, epochs, seed=0):
    import jax.numpy as jnp

    import vqvaehmm_tpu as vt
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences

    K = 3
    xs, us, zs = synthetic_sequences(12, 200, 5, 4, K, seed=seed,
                                     stickiness=stickiness,
                                     noise_scale=noise_scale)
    train_x, train_u = xs[:8], us[:8]
    test_x, test_u, test_z = xs[8:], us[8:], zs[8:]

    ds = vt.RandomChunkDataset(train_x, train_u, min_len=20, max_len=100,
                               samples_per_epoch=256, seed=seed)
    model = vt.make_model(5, 64, 3, 32, u_dim=4, trans_hidden=64)
    state, _ = vt.train_model(model, ds, num_epochs=epochs, lr=1e-3,
                              batch_size=32, log_fn=None)

    x, u = jnp.asarray(test_x), jnp.asarray(test_u)
    q = np.asarray(model.posterior(state.params, x))
    gamma = np.asarray(model.smoothed_posterior(state.params, x, u))
    vit = np.asarray(model.viterbi_decode(state.params, x, u))
    acc = {
        "argmax": best_perm_accuracy(q.argmax(1), test_z, K),
        "smoothed": best_perm_accuracy(gamma.argmax(1), test_z, K),
        "viterbi": best_perm_accuracy(vit, test_z, K),
    }
    sw = {
        "argmax": switches_per_100(q.argmax(1)),
        "smoothed": switches_per_100(gamma.argmax(1)),
        "viterbi": switches_per_100(vit),
        "truth": switches_per_100(test_z),
    }
    return acc, sw


def reference_checkpoint_stability():
    """Decode-stability comparison on the reference's shipped weights
    (no ground truth exists for its market data; switches/100 steps is the
    signal-stability metric a downstream allocator feels)."""
    ckpt = "/root/reference/models/vae_hmm.pt"
    if not os.path.exists(ckpt):
        return None
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.utils import (load_torch_file,
                                    vae_hmm_params_from_state_dict)

    sd = load_torch_file(ckpt)
    params = vae_hmm_params_from_state_dict(sd)
    hidden, input_dim, _ = sd["encoder.conv1.weight"].shape
    K = sd["encoder.to_logits.weight"].shape[0]
    hidden2 = sd["encoder.conv2.weight"].shape[0]
    trans_hidden, u_dim = sd["prior.transition_net.0.weight"].shape
    model = make_model(input_dim, hidden, K, hidden2, u_dim=u_dim,
                       trans_hidden=trans_hidden)
    xs, us, _ = synthetic_sequences(4, 200, input_dim, u_dim, K, seed=1)
    x, u = jnp.asarray(xs), jnp.asarray(us)
    q = np.asarray(model.posterior(params, x))
    gamma = np.asarray(model.smoothed_posterior(params, x, u))
    vit = np.asarray(model.viterbi_decode(params, x, u))
    return {
        "argmax_switches_per_100": switches_per_100(q.argmax(1)),
        "smoothed_switches_per_100": switches_per_100(gamma.argmax(1)),
        "viterbi_switches_per_100": switches_per_100(vit),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cells = [(s, n) for s in (0.90, 0.97, 0.99) for n in (1.0, 2.0, 3.0)]
    log(f"{'stick':>6} {'noise':>6} | {'argmax':>7} {'smooth':>7} "
        f"{'viterbi':>7} | best gain")
    for stickiness, noise in cells:
        acc, sw = run_cell(stickiness, noise, args.epochs, args.seed)
        gain = max(acc["smoothed"], acc["viterbi"]) - acc["argmax"]
        print(json.dumps({"stickiness": stickiness, "noise_scale": noise,
                          "acc": {k: round(v, 4) for k, v in acc.items()},
                          "switches_per_100":
                              {k: round(v, 2) for k, v in sw.items()},
                          "gain_pts": round(gain * 100, 1)}), flush=True)
        log(f"{stickiness:6.2f} {noise:6.1f} | {acc['argmax']:7.3f} "
            f"{acc['smoothed']:7.3f} {acc['viterbi']:7.3f} | "
            f"{gain * 100:+5.1f} pts")

    ref = reference_checkpoint_stability()
    if ref is not None:
        print(json.dumps({"reference_checkpoint_stability": ref}),
              flush=True)


if __name__ == "__main__":
    main()
