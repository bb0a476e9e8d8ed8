"""On-chip marginal cost of the vmapped member axis in ensemble training.

Times the epoch-fused train step at N members for N in {1, 2, 4, 8}
(same B/T/K as bench.py's headline) and reports the per-member marginal
rate.  On TPU the member axis batches the model's small matmuls onto
the MXU, so extra seeds should ride pipeline slack: the interesting
number is epoch_time(N) / epoch_time(1).

Methodology: matched-call subtraction with TRUE host-fetch syncs —
per-step cost = (t(2R steps) - t(R steps)) / R over per-point medians,
synced by fetching the per-member losses to host (np.asarray).  Through
the axon relay `block_until_ready()` returns before the remote
computation finishes (an earlier version of this script used it and
measured dispatch overhead, reporting an impossible 18M seqs/s); only a
host fetch is a real barrier here (CLAUDE.md measurement trap; same
recipe as utils/benchmarking.py and bench.py's epoch timing).

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
STEPS = 400  # R: batches per epoch call at the measured point
TRIALS = 5


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

    def tiled(steps):
        tile = jax.jit(lambda a: jnp.broadcast_to(
            a[None], (steps,) + a.shape) + jnp.zeros((), a.dtype))
        return (tile(jnp.asarray(x)), tile(jnp.asarray(u)),
                tile(jnp.asarray(ln)))

    data1, data2 = tiled(STEPS), tiled(2 * STEPS)

    results = {}
    for fused in (False, True):
        mode = "fused" if fused else "vmap_xla"
        base = None
        for n in (1, 2, 4, 8):
            states = init_ensemble_state(model, tx, range(n))
            step = make_ensemble_epoch_step(model, tx, donate=False,
                                            fused=fused)

            def timed(data):
                """Median wall time of TRIALS calls, each synced by a
                host fetch of the (N,) per-member losses (a real barrier
                through the relay, unlike block_until_ready)."""
                xs, us_, lns = data
                np.asarray(step(states, xs, us_, lns,
                                jnp.float32(1.0))[1])
                ts = []
                for _ in range(TRIALS):
                    t0 = time.perf_counter()
                    _, losses = step(states, xs, us_, lns,
                                     jnp.float32(1.0))
                    np.asarray(losses)
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts)), ts

            t1, ts1 = timed(data1)
            t2, ts2 = timed(data2)
            step_us = (t2 - t1) / STEPS * 1e6
            # [min, max] spread of the marginal across per-trial
            # pairings (sorted t(R) x sorted t(2R) extremes) — the
            # invariant is that published claims sit inside a RECORDED
            # spread (round-3 advisor finding: the point medians alone
            # regressed that)
            lo_us = max((min(ts2) - max(ts1)) / STEPS * 1e6, 0.0)
            hi_us = (max(ts2) - min(ts1)) / STEPS * 1e6
            if base is None:
                base = step_us
            results[f"{mode} n={n}"] = {
                "us_per_step_marginal": round(step_us, 1),
                "us_per_step_spread": [round(lo_us, 1), round(hi_us, 1)],
                "t_R_s": round(t1, 4), "t_2R_s": round(t2, 4),
                "t_R_trials_s": [round(t, 4) for t in ts1],
                "t_2R_trials_s": [round(t, 4) for t in ts2],
                "vs_n1": round(step_us / base, 3),
                "seqs_per_sec_total": round(n * B / (step_us * 1e-6)),
            }
            print(f"{mode} n={n}: {step_us:.1f} us/step marginal "
                  f"[{lo_us:.1f}, {hi_us:.1f}] "
                  f"(t(R)={t1:.3f}s t(2R)={t2:.3f}s R={STEPS}) "
                  f"({step_us / base:.2f}x n=1), "
                  f"{n * B / (step_us * 1e-6):,.0f} member-seqs/s",
                  file=sys.stderr)
    out = {"backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "B": B, "T": T, "steps": STEPS, "results": results}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "ensemble_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
