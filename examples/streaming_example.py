"""Streaming regime detection: feed market frames one tick at a time.

Demonstrates the online filter (models/online.py): O(1) work per frame,
settled posteriors identical to the batch `filtered_posterior`, plus the
provisional `peek` for the newest tick.  The reference has no streaming
path — its backtester re-encodes a 20-step window per rebalance
(reference backtesting.py:43-44).

Run: python examples/streaming_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.data.synthetic import synthetic_sequences
from vqvaehmm_tpu.models.online import OnlineFilter


def main():
    model = make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    params = model.init(jax.random.PRNGKey(0))

    xs, us, zs = synthetic_sequences(1, 60, seed=0)
    x, u = np.asarray(xs[0]), np.asarray(us[0])

    f = OnlineFilter(model, params)
    print("tick  settled_t  p(regime)                    peek(newest)")
    for t in range(x.shape[1]):
        settled = f.update(x[:, t], u[:, t])
        peek = f.peek()
        for s, q in settled:
            print(f"{t:4d}  {s:9d}  {np.round(q, 3)}  "
                  f"{np.round(peek, 3)}")
    for s, q in f.finish():
        print(f" end  {s:9d}  {np.round(q, 3)}")

    # the streamed columns equal the batch filtered posterior exactly
    import jax.numpy as jnp

    batch = model.filtered_posterior(
        params, jnp.asarray(x[None]), jnp.asarray(u[None]),
        jnp.asarray(np.array([x.shape[1]], np.int32)))
    print("matches batch filtered_posterior:",
          np.allclose(np.asarray(batch)[0, :, -1], q, atol=1e-5))


if __name__ == "__main__":
    main()
