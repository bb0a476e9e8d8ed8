"""Quality evaluation on synthetic ground truth: regime recovery accuracy
for each decode mode (mean-field argmax vs smoothed vs Viterbi), ELBO, and
reconstruction MSE.  Establishes the quality baseline the reference never
published (BASELINE.md).

Run: JAX_PLATFORMS=cpu python scripts/quality_eval.py [--epochs N]
Prints one JSON dict on stdout.
"""

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


def best_perm_accuracy(pred: np.ndarray, true: np.ndarray, K: int) -> float:
    best = 0.0
    for perm in itertools.permutations(range(K)):
        best = max(best, float((np.asarray(perm)[pred] == true).mean()))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import vqvaehmm_tpu as vt
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.eval.evaluate import masked_recon_mse

    K = 3
    xs, us, zs = synthetic_sequences(10, 200, 5, 4, K, seed=args.seed,
                                     stickiness=0.96)
    train_x, train_u = xs[:8], us[:8]
    test_x, test_u, test_z = xs[8:], us[8:], zs[8:]

    ds = vt.RandomChunkDataset(train_x, train_u, min_len=20, max_len=100,
                               samples_per_epoch=256, seed=args.seed)
    model = vt.make_model(5, 64, 3, 32, u_dim=4, trans_hidden=64)
    state, hist = vt.train_model(model, ds, num_epochs=args.epochs,
                                 lr=1e-3, batch_size=32, log_fn=None)

    x = jnp.asarray(test_x)
    u = jnp.asarray(test_u)
    lengths = jnp.full((test_x.shape[0],), test_x.shape[2], jnp.int32)

    q = np.asarray(model.posterior(state.params, x))
    gamma = np.asarray(model.smoothed_posterior(state.params, x, u))
    vit = np.asarray(model.viterbi_decode(state.params, x, u))

    out = {
        "final_train_loss": round(hist[-1], 4),
        "test_elbo": round(float(model.compute_loss(
            state.params, x, u, lengths, 1.0)), 4),
        "test_recon_mse": round(
            masked_recon_mse(model, state.params, test_x,
                             np.asarray(lengths)), 4),
        "regime_acc_meanfield_argmax": round(
            best_perm_accuracy(q.argmax(1), test_z, K), 4),
        "regime_acc_smoothed_argmax": round(
            best_perm_accuracy(gamma.argmax(1), test_z, K), 4),
        "regime_acc_viterbi": round(
            best_perm_accuracy(vit, test_z, K), 4),
        "epochs": args.epochs,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
