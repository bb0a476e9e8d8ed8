"""Multi-seed ensemble training: quality spread + best-of-N payoff.

Trains N seeds simultaneously (train/ensemble.py::train_ensemble) on
synthetic 3-regime data with ground truth, then reports each member's
final loss and regime-recovery accuracy — quantifying how much seed
variance the reference's single-draw training (train.py's fixed seed)
leaves on the table, and what picking the best ensemble member buys.

Run: JAX_PLATFORMS=cpu python scripts/ensemble_eval.py [--seeds 8]
     (or on TPU, where the vmapped member axis is near-free)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")

import numpy as np


def regime_accuracy(model, params, xs, zs):
    """Best-permutation argmax accuracy vs ground-truth labels."""
    from itertools import permutations

    import jax.numpy as jnp

    preds = []
    for x in xs:
        q = model.posterior(params, jnp.asarray(x)[None], fused=False)
        preds.append(np.asarray(q.argmax(axis=1))[0])
    best = 0.0
    K = int(max(z.max() for z in zs)) + 1
    for perm in permutations(range(K)):
        acc = np.mean([np.mean(np.array([perm[p] for p in pr]) == z)
                       for pr, z in zip(preds, zs)])
        best = max(best, float(acc))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--fixture", action="store_true",
                    help="train/evaluate on the committed market-fixture "
                         "windows (artifacts/data) instead of synthetic "
                         "sequences; accuracy is held-out Viterbi decode "
                         "vs the fixture's ground-truth regimes")
    ap.add_argument("--fused", action="store_true",
                    help="run each member through the fused Pallas "
                         "loss+grads kernel (lax.map over members — the "
                         "faster on-chip configuration; BENCH_NOTES "
                         "'Ensemble member-axis marginal')")
    args = ap.parse_args()

    from vqvaehmm_tpu import RandomChunkDataset, make_model
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.train import ensemble_member, train_ensemble

    if args.fixture:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = os.path.join(root, "artifacts", "data")
        xw = np.load(os.path.join(d, "x_sequences.npy"))
        uw = np.load(os.path.join(d, "u_sequences.npy"))
        zw = np.load(os.path.join(d, "z_windows.npy"))
        n_train = int(0.8 * len(xw))
        xs = [x for x in xw[:n_train]]
        us = [u for u in uw[:n_train]]
        # held-out evaluation windows + their ground truth
        eval_x, eval_z = xw[n_train:], zw[n_train:]
        eval_u = uw[n_train:]
    else:
        xs, us, zs = synthetic_sequences(6, 150, seed=0)
        eval_x, eval_u, eval_z = xs, us, zs
    ds = RandomChunkDataset(xs, us, min_len=20, max_len=64,
                            samples_per_epoch=128, seed=0)
    model = make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)

    t0 = time.perf_counter()
    states, hist, best = train_ensemble(
        model, ds, seeds=range(args.seeds), num_epochs=args.epochs,
        batch_size=32, fused=args.fused, log_fn=None)
    wall = time.perf_counter() - t0

    finals = hist[:, -1]
    if args.fixture:
        from itertools import permutations

        import jax.numpy as jnp

        xb, ub = jnp.asarray(eval_x), jnp.asarray(eval_u)
        zf = np.asarray(eval_z).reshape(-1)

        def acc_of(params):
            vit = np.asarray(model.viterbi_decode(params, xb, ub))
            pred = vit.reshape(-1)
            return max(float((np.asarray(p)[pred] == zf).mean())
                       for p in permutations(range(3)))

        accs = [acc_of(ensemble_member(states, i).params)
                for i in range(args.seeds)]
    else:
        accs = [regime_accuracy(model, ensemble_member(states, i).params,
                                eval_x, eval_z)
                for i in range(args.seeds)]
    out = {
        "data": "market_fixture_heldout" if args.fixture else "synthetic",
        "n_seeds": args.seeds,
        "epochs": args.epochs,
        "wall_seconds": round(wall, 1),
        "final_loss": {"min": float(finals.min()),
                       "median": float(np.median(finals)),
                       "max": float(finals.max())},
        "regime_acc": {"min": round(min(accs), 4),
                       "median": round(float(np.median(accs)), 4),
                       "max": round(max(accs), 4)},
        "best_member": best,
        "best_member_acc": round(accs[best], 4),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
