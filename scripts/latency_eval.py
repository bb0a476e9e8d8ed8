"""Saturated per-batch latency of every decode/inference path.

Methodology: a jitted fori-style scan repeats the operation R times per
device call on index-perturbed inputs (so XLA cannot CSE the iterations),
and the marginal cost is (t(2R) - t(R)) / R with R chosen so BOTH points
spend far longer on device than the ~26 ms transport window — device
compute overlaps the RPC below that, silently hiding up to one window of
work (BENCH_NOTES.md "Measurement-methodology correction").

Run on the TPU: python scripts/latency_eval.py
Prints one JSON line per path.
"""

from __future__ import annotations

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


from vqvaehmm_tpu.utils.benchmarking import saturated_marginal  # noqa: E402


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.ops import hmm as hops
    from vqvaehmm_tpu.ops.pallas_hmm import viterbi_pallas

    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", choices=("highest", "default"),
                    default="highest",
                    help="model matmul_precision (every kernel follows it)")
    args = ap.parse_args()

    B, C, T, K, U = 64, 5, 200, 3, 4
    model = make_model(C, 64, K, 32, u_dim=U, trans_hidden=128,
                       matmul_precision=args.precision)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, U, T)).astype(np.float32))
    lengths = jnp.asarray(np.full(B, T, np.int32))
    log_pi = jnp.asarray(np.log(rng.dirichlet(np.ones(K))).astype(np.float32))
    log_A = jnp.asarray(np.log(
        rng.dirichlet(np.ones(K), size=(B, T, K))).astype(np.float32))
    log_obs = jnp.asarray(rng.normal(size=(B, T, K)).astype(np.float32))

    def repeat_xu(fn):
        def make(R):
            @jax.jit
            def f():
                def body(c, i):
                    out = fn(x + (i * 1e-7).astype(jnp.float32), u)
                    return c + jnp.sum(out.astype(jnp.float32)), None
                tot, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32),
                    jnp.arange(R, dtype=jnp.int32))
                return tot
            return f
        return make

    def repeat_obs(fn):
        def make(R):
            @jax.jit
            def f():
                def body(c, i):
                    out = fn(log_obs + (i * 1e-7).astype(jnp.float32))
                    return c + jnp.sum(out.astype(jnp.float32)), None
                tot, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32),
                    jnp.arange(R, dtype=jnp.int32))
                return tot
            return f
        return make

    paths = [
        ("viterbi_recursion_scan", repeat_obs(
            lambda o: hops.viterbi(log_pi, log_A, o, lengths).states), 200),
        ("viterbi_recursion_pallas", repeat_obs(
            lambda o: viterbi_pallas(log_pi, log_A, o, lengths).states), 30),
        ("smoothing_scan", repeat_obs(
            lambda o: hops.posterior_marginals(log_pi, log_A, o, lengths)),
            150),
        ("decode_e2e_fused", repeat_xu(
            lambda xx, uu: model.viterbi_decode(params, xx, uu, lengths)),
            60),
        ("decode_e2e_scan", repeat_xu(
            lambda xx, uu: model.viterbi_decode(params, xx, uu, lengths,
                                                use_pallas=False)), 300),
        ("smoothed_e2e_fused_evidence", repeat_xu(
            lambda xx, uu: model.smoothed_posterior(params, xx, uu,
                                                    lengths)), 150),
        ("smoothed_e2e_xla", repeat_xu(
            lambda xx, uu: model.smoothed_posterior(params, xx, uu, lengths,
                                                    use_pallas=False)), 250),
        ("filtered_e2e_fused_evidence", repeat_xu(
            lambda xx, uu: model.filtered_posterior(params, xx, uu,
                                                    lengths)), 120),
        ("filtered_e2e_xla", repeat_xu(
            lambda xx, uu: model.filtered_posterior(params, xx, uu, lengths,
                                                    use_pallas=False)), 200),
    ]
    for name, make, est in paths:
        us, R = saturated_marginal(make, est)
        print(json.dumps({"path": name, "us_per_batch": round(us, 1),
                          "B": B, "T": T, "K": K, "R": R}), flush=True)


if __name__ == "__main__":
    main()
