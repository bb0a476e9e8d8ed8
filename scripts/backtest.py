"""Backtest runner script (reference: backtest.py:1-390).

Runs the GMM-stack backtest with transaction costs, the equal-weight
benchmark, and the Monte Carlo simulation with percentile analytics +
plots — on market data when available, synthetic otherwise.

Run: python scripts/backtest.py [--synthetic]
"""

import argparse
import os

# persistent compile cache (CLAUDE.md: remote compiles cost minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n-sim", type=int, default=1000)
    ap.add_argument("--n-days", type=int, default=252)
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu.backtest import (analyze_monte_carlo,
                                       monte_carlo_simulation,
                                       plot_monte_carlo, regime_statistics)
    from vqvaehmm_tpu.train.gmm_pipeline import (benchmark_equal_weight,
                                                 train_improved_system)

    # ---- data
    if args.synthetic:
        rng = np.random.default_rng(0)
        T, A = 800, 6
        returns = rng.normal(4e-4, 0.01, size=(T, A)).astype(np.float32)
    else:
        from vqvaehmm_tpu.data.market import load_portfolio_data

        data = load_portfolio_data()
        if data["returns"] is None:
            rng = np.random.default_rng(0)
            returns = rng.normal(4e-4, 0.01, size=(800, 6)).astype(np.float32)
        else:
            returns = data["returns"].values.astype(np.float32)
    T, A = returns.shape

    # ---- GMM stack: detector + per-regime optimizer
    print("training GMM stack...")
    system = train_improved_system(returns, n_regimes=3, num_epochs=100,
                                   patience=20, log_fn=None)
    from vqvaehmm_tpu.models.gmm import prepare_regime_features

    feats = prepare_regime_features(returns)
    regimes = system.detector.predict_regime(feats)
    aligned = returns[-len(regimes):]

    # ---- regime-conditional statistics + Monte Carlo
    means, covs = regime_statistics(aligned, regimes, K=3)

    def weight_fn(onehot):
        return system.optimizer(system.params, onehot[None])[0]

    print(f"running {args.n_sim} Monte Carlo paths x {args.n_days} days...")
    mc = monte_carlo_simulation(weight_fn, means, covs,
                                jax.random.PRNGKey(0), n_sim=args.n_sim,
                                n_days=args.n_days)
    stats = analyze_monte_carlo(mc)
    print("Monte Carlo:", {k: round(v, 4) for k, v in stats.items()})
    fig = plot_monte_carlo(mc, os.path.join(args.outdir,
                                            "monte_carlo_results.png"))
    if fig is not None:
        print("saved monte_carlo_results.png")

    # ---- equal-weight benchmark (reference backtest.py:295-305)
    bench = benchmark_equal_weight(aligned)
    print("equal-weight benchmark:",
          {k: round(v, 4) for k, v in bench.items()})


if __name__ == "__main__":
    main()
