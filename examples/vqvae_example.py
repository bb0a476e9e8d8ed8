"""True VQ-VAE + HMM example — the reference's design sketch
(pseudocode.txt) running for real: train the quantized autoencoder, fit the
regime HMM over discrete code indices by EM, generate new sequences by
ancestral sampling.

Run: JAX_PLATFORMS=cpu python examples/vqvae_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvaehmm_tpu.data.synthetic import synthetic_sequences
from vqvaehmm_tpu.models import VQVAEConfig, VQVAEHMM


def main():
    xs, _, zs = synthetic_sequences(8, 128, seed=0, stickiness=0.96)
    x = jnp.asarray(xs)
    lengths = jnp.full((xs.shape[0],), xs.shape[2], jnp.int32)

    cfg = VQVAEConfig(input_dim=5, hidden_dim=32, hidden_dim2=16,
                      num_codes=4, latent_dim=8)
    model = VQVAEHMM(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return model.compute_loss(p, x, lengths).total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(150):
        params, opt_state, loss = step(params, opt_state)
        if (i + 1) % 50 == 0:
            parts = model.compute_loss(params, x, lengths)
            print(f"step {i + 1}: total={float(parts.total):.4f} "
                  f"recon={float(parts.recon):.4f} "
                  f"commit={float(parts.commitment):.4f}")

    # discrete codes + EM HMM over them (pseudocode.txt:26-27)
    codes = model.codes(params, x)
    used = len(np.unique(np.asarray(codes)))
    print(f"codebook usage: {used}/{cfg.num_codes} codes")
    em = model.fit_hmm(params, x, n_iters=30)
    print(f"EM final log-likelihood: {float(em.log_likelihoods[-1]):.1f}")
    A = np.exp(np.asarray(em.model.log_A))
    print(f"learned transition diagonal: {np.round(np.diag(A), 3)}")

    # ancestral generation (pseudocode.txt:29-32)
    gen = model.sample(params, em.model, jax.random.PRNGKey(1),
                      seq_len=64, batch=2)
    print(f"generated sequences: {gen.shape}")


if __name__ == "__main__":
    main()
