"""CLI inference report (reference: inference.py:8-82).

Prints current regime, allocation table, regime distribution and the last-N
allocations.  --stack vae (default) runs the canonical VAE-HMM + portfolio
head; --stack gmm reproduces the reference CLI's actual workflow — load the
persisted GMM stack saved by train_improved_system
(reference: inference.py:8-17 loading train_simple.py:185-197's artifacts)
and report from a (T, A) returns panel.
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np


def report(posterior_fn, weight_fn, x: np.ndarray,
           tickers: Optional[list] = None, last_n: int = 5,
           log_fn=print) -> dict:
    """x: (1, C, T) feature sequence; posterior_fn/weight_fn closed over
    params."""
    import jax.numpy as jnp

    q = np.asarray(posterior_fn(jnp.asarray(x)))  # (1, K, T)
    K, T = q.shape[1], q.shape[2]
    regimes = q.argmax(axis=1)[0]  # (T,)
    current_regime = int(regimes[-1])
    weights = np.asarray(weight_fn(jnp.asarray(q)))[0]  # (A,)
    n_assets = len(weights)
    tickers = tickers or [f"ASSET{i}" for i in range(n_assets)]

    # last-N allocations from rolling last steps
    last_allocs = []
    for t in range(max(0, T - last_n), T):
        qt = q[:, :, :t + 1]
        wt = np.asarray(weight_fn(jnp.asarray(qt)))[0]
        last_allocs.append(wt)

    dist = np.bincount(regimes, minlength=K) / T
    out = {
        "current_regime": current_regime,
        "regime_probs": q[0, :, -1].tolist(),
        "allocation": dict(zip(tickers, weights.tolist())),
        "regime_distribution": dist.tolist(),
        "last_allocations": [a.tolist() for a in last_allocs],
    }
    if log_fn:
        log_fn(f"Current regime: {current_regime} "
               f"(p={q[0, current_regime, -1]:.3f})")
        log_fn("Allocation:")
        for t_, w_ in zip(tickers, weights):
            log_fn(f"  {t_:8s} {w_ * 100:6.2f}%")
        log_fn("Regime distribution over window: "
               + ", ".join(f"R{k}: {d * 100:.1f}%"
                           for k, d in enumerate(dist)))
    return out


def report_gmm(system, returns: np.ndarray,
               tickers: Optional[list] = None, last_n: int = 5,
               log_fn=print) -> dict:
    """GMM-stack report from a (T, A) daily-returns panel (the reference
    CLI's workflow, inference.py:19-82): engineered features -> GMM regime
    posterior -> expert-bank allocation."""
    import jax.numpy as jnp

    from ..models.gmm import prepare_regime_features

    returns = np.asarray(returns, np.float32)
    feats = prepare_regime_features(returns)
    # static responsibilities, or exact HMM smoothed marginals when the
    # system carries learned dynamics (train_improved_system temporal=True)
    probs = system.regime_marginals(feats)                  # (Tf, K)
    K, Tf = probs.shape[1], probs.shape[0]
    regimes = probs.argmax(axis=1)
    current_regime = int(regimes[-1])
    weights = np.asarray(system.optimizer(
        system.params, jnp.asarray(probs[-1:])))[0]         # (A,)
    tickers = tickers or [f"ASSET{i}" for i in range(len(weights))]

    last_allocs = [np.asarray(system.optimizer(
        system.params, jnp.asarray(probs[t:t + 1])))[0]
        for t in range(max(0, Tf - last_n), Tf)]
    dist = np.bincount(regimes, minlength=K) / Tf
    out = {
        "current_regime": current_regime,
        "regime_probs": probs[-1].tolist(),
        "allocation": dict(zip(tickers, weights.tolist())),
        "regime_distribution": dist.tolist(),
        "last_allocations": [a.tolist() for a in last_allocs],
    }
    if log_fn:
        log_fn(f"Current regime: {current_regime} "
               f"(p={probs[-1, current_regime]:.3f})")
        log_fn("Allocation:")
        for t_, w_ in zip(tickers, weights):
            log_fn(f"  {t_:8s} {w_ * 100:6.2f}%")
        log_fn("Regime distribution over window: "
               + ", ".join(f"R{k}: {d * 100:.1f}%"
                           for k, d in enumerate(dist)))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--head-checkpoint", default=None)
    parser.add_argument("--stack", choices=("vae", "gmm", "vq"),
                        default="vae",
                        help="vae: VAE-HMM + portfolio head; gmm: persisted "
                             "ImprovedSystem archive (checkpoint = its "
                             ".npz); vq: persisted VQStack archive "
                             "(train/vq_pipeline.py, checkpoint = its "
                             "vq_stack.npz)")
    parser.add_argument("--data", default=None,
                        help="vae/vq: .npy (1,C,T) features; gmm: .npy "
                             "(T,A) returns; synthetic if unset")
    args = parser.parse_args(argv)

    if args.stack == "vq":
        import jax
        import jax.numpy as jnp

        from ..core.config import load_config
        from ..models.portfolio import HeadConfig, RegimePortfolioOptimizer
        from ..train.vq_pipeline import VQStack

        stack = VQStack.load(args.checkpoint)
        cfg = load_config(args.config)
        if args.data:
            x = np.load(args.data)
            if x.ndim == 2:
                x = x[None]
        else:
            from ..data.synthetic import synthetic_sequences

            xs, _, _ = synthetic_sequences(
                1, 100, stack.model.cfg.input_dim, cfg.model.u_dim or 1,
                stack.hmm.K)
            x = xs
        from ..data.checkpoint import load_params_npz

        head = RegimePortfolioOptimizer(HeadConfig(
            K=stack.hmm.K, n_assets=cfg.portfolio.n_assets,
            hidden_dim=cfg.portfolio.hidden_dim))
        head_params = (load_params_npz(args.head_checkpoint)
                       if args.head_checkpoint
                       else head.init(jax.random.PRNGKey(0)))
        codes = np.asarray(stack.codes(jnp.asarray(x)))[0]
        print(f"Codes (last 10): {codes[-10:].tolist()}  "
              f"({len(np.unique(codes))}/{stack.model.cfg.num_codes} "
              "codebook entries used)")
        # report() wants a (1, K, T) posterior fn over x
        return report(
            lambda a: jnp.transpose(stack.regime_marginals(
                a, jnp.full((a.shape[0],), a.shape[2], jnp.int32)),
                (0, 2, 1)),
            lambda q: head(head_params, q), x)

    if args.stack == "gmm":
        from ..train.gmm_pipeline import load_improved_system

        system = load_improved_system(args.checkpoint)
        if args.data:
            returns = np.load(args.data)
        else:
            rng = np.random.default_rng(0)
            returns = rng.normal(5e-4, 0.01,
                                 size=(252, system.optimizer.cfg.n_assets))
        report_gmm(system, returns)
        return

    import jax
    import jax.numpy as jnp

    from ..core.config import load_config
    from ..data.checkpoint import load_params_npz
    from ..models.portfolio import HeadConfig, RegimePortfolioOptimizer
    from ..models.vae_hmm import VAEHMM

    cfg = load_config(args.config)
    model = VAEHMM(cfg.model)
    if args.checkpoint.endswith(".npz"):
        params = load_params_npz(args.checkpoint)
    else:
        from ..utils.torch_interop import (load_torch_file,
                                           vae_hmm_params_from_state_dict)

        params = vae_hmm_params_from_state_dict(
            load_torch_file(args.checkpoint))
    from ..data.checkpoint import validate_params_for

    validate_params_for(model, params,
                        what=f"checkpoint {args.checkpoint!r}")

    if args.head_checkpoint and not args.head_checkpoint.endswith(".npz"):
        # reference .pt head checkpoints (models/portfolio.pt /
        # portfolio_improved.pt): detect the family from the state_dict
        # naming and build the matching head with dims from the weights
        from ..models.portfolio import ImprovedPortfolioOptimizer
        from ..utils.torch_interop import (head_params_from_state_dict,
                                           load_torch_file)

        head_params = head_params_from_state_dict(
            load_torch_file(args.head_checkpoint))
        w1 = np.asarray(head_params["fc1"]["weight"])
        if w1.ndim == 3:   # stacked regime bank -> Improved head
            K, hidden = w1.shape[0], w1.shape[1]
            n_assets = np.asarray(head_params["fc3"]["weight"]).shape[1]
            head = ImprovedPortfolioOptimizer(HeadConfig(
                K=K, n_assets=n_assets, hidden_dim=hidden))
        else:
            hidden, K = w1.shape
            n_assets = np.asarray(head_params["fc3"]["weight"]).shape[0]
            head = RegimePortfolioOptimizer(HeadConfig(
                K=K, n_assets=n_assets, hidden_dim=hidden))
        if K != cfg.model.K:
            raise ValueError(f"head checkpoint K={K} != model K="
                             f"{cfg.model.K}")
    else:
        head = RegimePortfolioOptimizer(HeadConfig(
            K=cfg.model.K, n_assets=cfg.portfolio.n_assets,
            hidden_dim=cfg.portfolio.hidden_dim))
        if args.head_checkpoint:
            head_params = load_params_npz(args.head_checkpoint)
        else:
            head_params = head.init(jax.random.PRNGKey(0))

    if args.data:
        x = np.load(args.data)
        if x.ndim == 2:
            x = x[None]
    else:
        from ..data.synthetic import synthetic_sequences

        xs, _, _ = synthetic_sequences(1, 100, cfg.model.input_dim,
                                       cfg.model.u_dim or 1, cfg.model.K)
        x = xs

    report(lambda a: model.posterior(params, a),
           lambda q: head(head_params, q), x)


if __name__ == "__main__":
    main()
