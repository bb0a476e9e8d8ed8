"""End-to-end two-stage training script (reference: train.py:1-119).

Stage 1: VAE-HMM on market (or synthetic fallback) data.
Stage 2: portfolio head on frozen posteriors with Sharpe loss over
random 20-day return windows (reference train.py:63-75).
Saves models/{vae_hmm.npz, portfolio.npz}.

Run: python scripts/train.py [--synthetic] [--epochs N]
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

import jax
import numpy as np

TICKERS = ["SPY", "QQQ", "IWM", "EFA", "EEM", "AGG", "TLT", "GLD", "VNQ",
           "DBC"]  # 10-ETF universe (reference train.py:7-18)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true",
                    help="skip yfinance, use synthetic data")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--port-epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--outdir", default="models")
    args = ap.parse_args()

    import jax.numpy as jnp

    import vqvaehmm_tpu as vt
    from vqvaehmm_tpu.data.checkpoint import save_params_npz
    from vqvaehmm_tpu.data.market import load_portfolio_data
    from vqvaehmm_tpu.data.synthetic import (synthetic_returns,
                                             synthetic_sequences)
    from vqvaehmm_tpu.models import HeadConfig, RegimePortfolioOptimizer
    from vqvaehmm_tpu.train import train_portfolio_optimizer

    # ---- data
    if args.synthetic:
        xs, us, _ = synthetic_sequences(16, 200, 5, 4, 3, seed=0)
        returns = None
    else:
        data = load_portfolio_data(TICKERS)
        xs, us = data["x_sequences"], data["u_sequences"]
        returns = data["returns"]

    dataset = vt.RandomChunkDataset(xs, us, min_len=20, max_len=200)

    # ---- stage 1: VAE-HMM (reference hyperparams, train.py:24-28)
    model = vt.make_model(5, 64, 3, 32, u_dim=4, trans_hidden=128)
    state, hist = vt.train_model(model, dataset, num_epochs=args.epochs,
                                 lr=args.lr, batch_size=64)
    os.makedirs(args.outdir, exist_ok=True)
    save_params_npz(os.path.join(args.outdir, "vae_hmm.npz"), state.params)

    # ---- stage 2: portfolio head on frozen posteriors
    n_assets = 10
    head = RegimePortfolioOptimizer(HeadConfig(K=3, n_assets=n_assets))
    head_params = head.init(jax.random.PRNGKey(1))

    # full windows only: pointwise heads read t = T-1, so the head stage
    # samples whole sequences (the reference trains its head on fixed
    # seq_len windows too, training.py:133-148)
    n_batches, B = 8, 32
    T = xs.shape[2]
    batches = []
    rng = np.random.default_rng(0)
    for _ in range(n_batches):
        idx = rng.integers(0, len(xs), size=B)
        batches.append((np.asarray(xs[idx], np.float32),
                        np.asarray(us[idx], np.float32),
                        np.full(B, T, np.int32)))
    if returns is not None and len(returns) > 30:
        r = returns.values.astype(np.float32)
        idx = rng.integers(0, len(r) - 21, size=(n_batches, B))
        rets = np.stack([[r[i:i + 20] for i in row] for row in idx])
    else:
        rets = synthetic_returns(n_batches, B, 20, n_assets, seed=2)

    result = train_portfolio_optimizer(head, head_params, model,
                                       state.params, batches, rets,
                                       num_epochs=args.port_epochs,
                                       lr=1e-3)
    save_params_npz(os.path.join(args.outdir, "portfolio.npz"),
                    result.params)
    # reference-loadable .pt twins (reference save_models, train.py:87-93)
    from vqvaehmm_tpu.utils import save_head_torch_file, save_torch_file

    save_torch_file(state.params, os.path.join(args.outdir, "vae_hmm.pt"))
    save_head_torch_file(result.params,
                         os.path.join(args.outdir, "portfolio.pt"))
    print(f"saved {args.outdir}/{{vae_hmm,portfolio}}.{{npz,pt}}")
    print(f"final VAE loss {hist[-1]:.4f}, "
          f"final portfolio loss {result.history[-1]:.4f}")


if __name__ == "__main__":
    main()
