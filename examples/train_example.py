"""End-to-end training example (reference: examples/train_example.py).

Trains the VAE-HMM on synthetic regime-switching data, then a portfolio
head on the frozen posteriors, prints the resulting allocation.

Run: JAX_PLATFORMS=cpu python examples/train_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import vqvaehmm_tpu as vt
from vqvaehmm_tpu.data.synthetic import synthetic_returns, synthetic_sequences
from vqvaehmm_tpu.models import HeadConfig, RegimePortfolioOptimizer
from vqvaehmm_tpu.train import train_portfolio_optimizer


def main():
    # 1. data
    xs, us, _ = synthetic_sequences(n_sequences=8, seq_len=200, seed=0)
    dataset = vt.RandomChunkDataset(xs, us, min_len=20, max_len=100,
                                    samples_per_epoch=256, seed=0)

    # 2. VAE-HMM (reference README recipe, smaller for the example)
    model = vt.make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    state, history = vt.train_model(model, dataset, num_epochs=15, lr=1e-3,
                                    batch_size=32)

    # 3. portfolio head on frozen posteriors
    head = RegimePortfolioOptimizer(HeadConfig(K=3, n_assets=10))
    head_params = head.init(jax.random.PRNGKey(1))
    batches = [next(iter([
        (xs[:4, :, :64], us[:4, :, :64], np.full(4, 64, np.int32))]))
        for _ in range(4)]
    returns = synthetic_returns(4, 4, horizon=20, n_assets=10, seed=1)
    result = train_portfolio_optimizer(head, head_params, model,
                                       state.params, batches, returns,
                                       num_epochs=10, lr=1e-3)

    # 4. allocate
    q = model.posterior(state.params, jnp.asarray(xs[:1]))
    weights = head(result.params, q)
    print("allocation:", np.round(np.asarray(weights)[0], 3))


if __name__ == "__main__":
    main()
