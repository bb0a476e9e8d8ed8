"""On-chip marginal cost of the vmapped member axis in ensemble training.

Times the epoch-fused train step at N members for N in {1, 2, 4, 8}
(same B/T/K as bench.py's headline) and reports the per-member marginal
rate.  On TPU the member axis batches the model's small matmuls onto
the MXU, so extra seeds should ride pipeline slack: the interesting
number is epoch_time(N) / epoch_time(1).

Run on TPU: python scripts/ensemble_bench.py
(CPU runs work but just show ~Nx scaling — no MXU to fill.)
"""

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

B, C, T, K, U = 64, 5, 200, 3, 4
STEPS = 400  # batches per epoch call (enough to saturate dispatch)


def main():
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.train.ensemble import (init_ensemble_state,
                                             make_ensemble_epoch_step)
    from vqvaehmm_tpu.train.trainer import make_optimizer

    model = make_model(C, 64, K, 32, u_dim=U, trans_hidden=128,
                       matmul_precision="default",
                       compute_dtype="bfloat16")
    tx = make_optimizer(1e-3)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, C, T)).astype(np.float32)
    u = rng.normal(size=(B, U, T)).astype(np.float32)
    ln = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    tile = jax.jit(lambda a: jnp.broadcast_to(
        a[None], (STEPS,) + a.shape) + jnp.zeros((), a.dtype))
    xs, us_, lns = tile(jnp.asarray(x)), tile(jnp.asarray(u)), \
        tile(jnp.asarray(ln))

    results = {}
    base = None
    for n in (1, 2, 4, 8):
        states = init_ensemble_state(model, tx, range(n))
        step = make_ensemble_epoch_step(model, tx, donate=False)
        _, losses = step(states, xs, us_, lns, jnp.float32(1.0))
        losses.block_until_ready()  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _, losses = step(states, xs, us_, lns, jnp.float32(1.0))
            losses.block_until_ready()
            times.append(time.perf_counter() - t0)
        ts = sorted(times)
        med, lo, hi = ts[2], ts[0], ts[-1]
        if base is None:
            base = med
        results[f"n={n}"] = {
            # median over 5 windows WITH [min, max] spread — published
            # claims must sit inside the recorded spread (CLAUDE.md)
            "epoch_s": round(med, 4),
            "epoch_s_spread": [round(lo, 4), round(hi, 4)],
            "vs_n1": round(med / base, 3),
            "seqs_per_sec_total": round(n * STEPS * B / med),
        }
        print(f"n={n}: {med:.4f}s [{lo:.4f}, {hi:.4f}] "
              f"({med / base:.2f}x n=1), "
              f"{n * STEPS * B / med:,.0f} member-seqs/s",
              file=sys.stderr)
    print(json.dumps({"backend": jax.default_backend(),
                      "B": B, "T": T, "steps": STEPS,
                      "results": results}))


if __name__ == "__main__":
    main()
