"""GMM-stack training: the reference's alternative pipeline
(train_simple.py:63-219) — engineered features -> GMM regimes ->
per-regime-expert portfolio optimizer trained on Sharpe with a
diversification penalty and early stopping.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gmm import SimpleRegimeDetector, prepare_regime_features
from ..models.portfolio import HeadConfig, ImprovedPortfolioOptimizer


class ImprovedSystem(NamedTuple):
    detector: SimpleRegimeDetector
    optimizer: ImprovedPortfolioOptimizer
    params: Dict
    history: list
    # Optional learned regime dynamics (log_pi (K,), log_A (K,K)) fitted
    # over the detector's own emission densities — models/hmm.
    # fit_transitions_em; set by train_improved_system(temporal=True).
    # With a chain, regime_marginals() replaces the static per-day
    # posterior (measured: ~half the spurious switching at equal
    # accuracy — BENCH_NOTES "Model-family comparison").
    chain: Optional[Tuple] = None

    def save(self, path: str) -> None:
        save_improved_system(self, path)

    @classmethod
    def load(cls, path: str) -> "ImprovedSystem":
        return load_improved_system(path)

    def regime_marginals(self, features,
                         mode: str = "smoothed") -> np.ndarray:
        """(Tf, K) per-day regime posterior.  Static GMM responsibilities
        without a chain; with one, exact HMM marginals over the SAME
        emission densities — mode="smoothed" (all-data, offline reports)
        or "filtered" (causal: day t uses days <= t only, the live
        trading choice)."""
        if mode not in ("smoothed", "filtered"):
            raise ValueError(f"unknown mode {mode!r}")
        if self.chain is None:
            return self.detector.predict_proba(features)
        from ..models.gmm import _log_prob_components
        from ..ops import hmm as hmm_ops

        log_pi, log_A = self.chain
        log_obs = _log_prob_components(
            self.detector.gmm.params,
            jnp.asarray(self.detector._norm(features)))[None]
        fn = (hmm_ops.posterior_marginals if mode == "smoothed"
              else hmm_ops.filtered_marginals)
        return np.asarray(fn(jnp.asarray(log_pi), jnp.asarray(log_A),
                             log_obs))[0]


def save_improved_system(system: ImprovedSystem, path: str) -> None:
    """Persist the whole GMM stack (detector + expert-bank head) to one
    .npz so train-once/infer-later round-trips — the reference saves
    regime_detector.pkl + portfolio_improved.pt (train_simple.py:185-197)
    and reloads them in inference.py:8-17; here both halves live in a
    single portable archive with no pickle."""
    import json

    gmm = system.detector.gmm
    if gmm.params is None:
        raise ValueError("cannot save an unfitted system")
    leaves, _ = jax.tree_util.tree_flatten(system.params)
    arrays = {f"head_{i}": np.asarray(a) for i, a in enumerate(leaves)}
    cfg = system.optimizer.cfg
    meta = {
        "n_regimes": system.detector.n_regimes,
        "gmm": {"n_init": gmm.n_init, "n_iter": gmm.n_iter,
                "reg_covar": gmm.reg_covar, "seed": gmm.seed,
                "log_likelihood": gmm.log_likelihood_},
        "head": {"K": cfg.K, "n_assets": cfg.n_assets,
                 "hidden_dim": cfg.hidden_dim},
    }
    det = system.detector
    extra = {}
    if det.feature_mu is not None:
        # the feature-normalization stats ARE part of the model: without
        # them a reloaded detector would z-score inference panels with
        # their own statistics (different scale than training)
        extra["feature_mu"] = np.asarray(det.feature_mu)
        extra["feature_sd"] = np.asarray(det.feature_sd)
    if system.chain is not None:
        extra["chain_log_pi"] = np.asarray(system.chain[0])
        extra["chain_log_A"] = np.asarray(system.chain[1])
    np.savez(path,
             meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
             gmm_weights=np.asarray(gmm.params.weights),
             gmm_means=np.asarray(gmm.params.means),
             gmm_covs=np.asarray(gmm.params.covs),
             history=np.asarray(system.history, np.float64),
             **extra, **arrays)


def load_improved_system(path: str) -> ImprovedSystem:
    """Inverse of save_improved_system: reconstruct detector + head with
    identical predictions (tested round-trip)."""
    import json

    from ..models.gmm import GMMParams

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        gmm_params = GMMParams(jnp.asarray(z["gmm_weights"]),
                               jnp.asarray(z["gmm_means"]),
                               jnp.asarray(z["gmm_covs"]))
        history = z["history"].tolist()
        n_head = sum(1 for k in z.files if k.startswith("head_"))
        leaves = [jnp.asarray(z[f"head_{i}"]) for i in range(n_head)]
        feature_mu = (np.asarray(z["feature_mu"])
                      if "feature_mu" in z.files else None)
        feature_sd = (np.asarray(z["feature_sd"])
                      if "feature_sd" in z.files else None)
        chain = ((jnp.asarray(z["chain_log_pi"]),
                  jnp.asarray(z["chain_log_A"]))
                 if "chain_log_pi" in z.files else None)

    g = meta["gmm"]
    detector = SimpleRegimeDetector(n_regimes=meta["n_regimes"],
                                    n_init=g["n_init"], seed=g["seed"])
    detector.gmm.n_iter = g["n_iter"]
    detector.gmm.reg_covar = g["reg_covar"]
    detector.gmm.params = gmm_params
    detector.gmm.log_likelihood_ = g["log_likelihood"]
    detector.feature_mu = feature_mu
    detector.feature_sd = feature_sd
    detector.fitted = True

    h = meta["head"]
    optimizer = ImprovedPortfolioOptimizer(HeadConfig(
        K=h["K"], n_assets=h["n_assets"], hidden_dim=h["hidden_dim"]))
    # Rebuild the pytree structure from a fresh init, then graft the
    # saved leaves (flatten order is deterministic for a fixed structure).
    template = optimizer.init(jax.random.PRNGKey(0))
    treedef = jax.tree_util.tree_structure(template)
    if len(leaves) != treedef.num_leaves:
        raise ValueError(
            f"archive {path!r} holds {len(leaves)} head arrays but the "
            f"current ImprovedPortfolioOptimizer has {treedef.num_leaves} "
            "(the head gained the reference's middle fc2 layer, "
            "train_simple.py:43-44); re-train or re-save the system")
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return ImprovedSystem(detector, optimizer, params, history, chain)


def train_improved_system(returns: np.ndarray, n_regimes: int = 3,
                          hidden_dim: int = 64, num_epochs: int = 200,
                          lr: float = 1e-3, lookback: int = 20,
                          diversification_weight: float = 0.1,
                          patience: int = 20, seed: int = 0,
                          temporal: bool = False, dropout: bool = False,
                          log_fn=print) -> ImprovedSystem:
    """End-to-end GMM stack (reference: train_simple.py:103-182).

    returns: (T, A) daily asset returns.  Fits the GMM on engineered
    features, then trains the per-regime MLP mixture on
    -Sharpe + diversification penalty (squared deviation from equal
    weight), with patience-based early stopping.

    dropout=True trains with the head's Dropout(0.2) active (a fresh key
    per step), as the reference's torch module does in train mode
    (train_simple.py:42,45 — it never calls .eval() while training).
    Default False: full-batch deterministic training, so the
    early-stopping loss is noise-free (documented deviation; inference
    is dropout-free in both cases, matching inference.py:17).

    temporal=True additionally fits regime DYNAMICS over the GMM's own
    emission densities (models/hmm.fit_transitions_em) and stores them
    on the system: `regime_marginals` then returns exact HMM smoothed
    posteriors instead of per-day static responsibilities — measured
    ~half the spurious regime switching at equal accuracy
    (BENCH_NOTES "Model-family comparison").  Capability upgrade over
    the reference's static detector; default off for exact parity.
    """
    returns = np.asarray(returns, np.float32)
    T, A = returns.shape

    feats = prepare_regime_features(returns, lookback=lookback)
    detector = SimpleRegimeDetector(n_regimes=n_regimes, seed=seed)
    detector.fit(feats)
    probs = detector.predict_proba(feats)              # (Tf, K)
    aligned_returns = returns[-len(probs):]            # align tails

    opt_model = ImprovedPortfolioOptimizer(
        HeadConfig(K=n_regimes, n_assets=A, hidden_dim=hidden_dim))
    params = opt_model.init(jax.random.PRNGKey(seed))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # training windows: every step t predicts weights from q_t and is
    # scored on the following `horizon` days of returns
    horizon = 20
    n = len(probs) - horizon
    q_all = jnp.asarray(probs[:n])                     # (N, K)
    fwd_rets = jnp.asarray(np.stack(
        [aligned_returns[t + 1:t + 1 + horizon] for t in range(n)]))  # (N,H,A)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            w = opt_model(p, q_all, key=key if dropout else None)  # (N, A)
            pr = (w[:, None, :] * fwd_rets).sum(-1)   # (N, H)
            mu = pr.mean(axis=1)
            sd = jnp.maximum(jnp.std(pr, axis=1, ddof=1), 1e-8)
            sharpe = (mu / sd).mean()
            # diversification penalty (reference :146-149): distance from
            # equal weight
            div = ((w - 1.0 / A) ** 2).sum(-1).mean()
            return -sharpe + diversification_weight * div

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    best = np.inf
    wait = 0
    best_params = params
    drop_key = jax.random.PRNGKey(seed + 1)
    for ep in range(num_epochs):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(drop_key, ep))
        loss = float(loss)
        history.append(loss)
        if loss < best - 1e-5:
            best = loss
            best_params = params
            wait = 0
        else:
            wait += 1
        if wait >= patience:
            if log_fn:
                log_fn(f"early stop at epoch {ep + 1} (best {best:.4f})")
            break
        if log_fn and (ep + 1) % 50 == 0:
            log_fn(f"Epoch {ep + 1}/{num_epochs}, Loss: {loss:.4f}")
    chain = None
    if temporal:
        from ..models.gmm import _log_prob_components
        from ..models.hmm import fit_transitions_em

        log_obs = _log_prob_components(
            detector.gmm.params, jnp.asarray(detector._norm(feats)))[None]
        log_pi, log_A, _ = fit_transitions_em(log_obs, n_iters=40)
        chain = (log_pi, log_A)
    return ImprovedSystem(detector, opt_model, best_params, history, chain)


def benchmark_equal_weight(returns: np.ndarray,
                           initial_capital: float = 100000.0,
                           tx_cost: float = 0.001,
                           rebalance_freq: int = 21) -> Dict[str, float]:
    """Equal-weight benchmark with periodic rebalancing costs
    (reference: backtest.py:295-305 — minus its dead duplicated tail)."""
    returns = np.asarray(returns, np.float64)
    T, A = returns.shape
    w = np.full(A, 1.0 / A)
    value = initial_capital
    values = [value]
    hold = w.copy()
    for t in range(T):
        day_ret = float((hold * returns[t]).sum())
        value *= 1.0 + day_ret
        # drift
        hold = hold * (1.0 + returns[t])
        s = hold.sum()
        hold = hold / s if s > 0 else np.full(A, 1.0 / A)
        if (t + 1) % rebalance_freq == 0:
            cost = tx_cost * np.abs(hold - w).sum()
            value *= 1.0 - cost
            hold = w.copy()
        values.append(value)
    values = np.asarray(values)
    rets = np.diff(values) / values[:-1]
    ann = (values[-1] / values[0]) ** (252 / max(T, 1)) - 1
    vol = rets.std() * np.sqrt(252)
    cummax = np.maximum.accumulate(values)
    mdd = ((values - cummax) / cummax).min()
    return {
        "total_return": float(values[-1] / values[0] - 1),
        "annual_return": float(ann),
        "annual_volatility": float(vol),
        "sharpe_ratio": float(ann / vol) if vol > 0 else 0.0,
        "max_drawdown": float(mdd),
        "final_value": float(values[-1]),
    }
