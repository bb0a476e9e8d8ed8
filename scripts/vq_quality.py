"""Quality demo for the true-VQ stack (models/vqvae_hmm.py): train the
VQ-VAE on synthetic regime-switching data, fit the categorical HMM over
code indices by Baum-Welch, and measure regime recovery vs ground truth.

The reference shipped only a pseudocode sketch of this model
(pseudocode.txt); this framework implements it, and this script shows the
implementation actually detects regimes: codes learned unsupervised ->
EM-HMM over codes -> posterior_mode vs true labels (best permutation).

Run: JAX_PLATFORMS=cpu python scripts/vq_quality.py [--epochs N]
Prints one JSON dict on stdout.
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.models.vqvae_hmm import VQVAEConfig, VQVAEHMM

    K = 3
    xs, us, zs = synthetic_sequences(10, 200, 5, 4, K, seed=args.seed,
                                     stickiness=0.96)
    train_x = jnp.asarray(xs[:8])
    test_x, test_z = jnp.asarray(xs[8:]), zs[8:]

    cfg = VQVAEConfig(input_dim=5, hidden_dim=32, hidden_dim2=16,
                      num_codes=K, latent_dim=16)
    model = VQVAEHMM(cfg)
    params = model.init(jax.random.PRNGKey(args.seed))
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            loss = model.compute_loss(p, train_x)
            return loss.total, loss

        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, parts

    for _ in range(args.epochs):
        params, opt_state, parts = step(params, opt_state)

    # codebook usage on held-out data (collapsed codebooks can't regime)
    codes = np.asarray(model.codes(params, test_x))
    usage = np.bincount(codes.reshape(-1), minlength=K) / codes.size

    em = model.fit_hmm(params, test_x, n_iters=50, seed=args.seed)
    states = np.asarray(em.model.posterior_mode(
        jnp.asarray(codes))).reshape(-1)
    true = test_z.reshape(-1)
    best = 0.0
    for perm in itertools.permutations(range(K)):
        best = max(best, float((np.asarray(perm)[states] == true).mean()))

    # generative round-trip sanity: samples have finite, data-scale stats
    samp = np.asarray(model.sample(params, em.model,
                                   jax.random.PRNGKey(1), seq_len=64,
                                   batch=4))

    print(json.dumps({
        "final_total_loss": round(float(parts.total), 4),
        "final_recon": round(float(parts.recon), 4),
        "codebook_usage": [round(float(v), 3) for v in usage],
        "regime_acc_code_hmm": round(best, 4),
        "em_final_loglik": round(float(np.asarray(
            em.log_likelihoods)[-1]), 2),
        "sample_std": round(float(samp.std()), 3),
        "epochs": args.epochs,
    }))


if __name__ == "__main__":
    main()
