"""Gaussian-mixture regime detection — the reference's alternative stack
(train_simple.py:10-28: sklearn GaussianMixture(n_init=10) over engineered
features) rebuilt natively in JAX.

TPU-native: EM runs as a jitted lax.scan; the reference's n_init=10
restarts run *simultaneously* via vmap over initializations (free
parallelism instead of 10 sequential sklearn fits), best log-likelihood
wins.  Full covariances via Cholesky; responsibilities via the precise
logsumexp kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precise import plog, plogsumexp, psoftmax


class GMMParams(NamedTuple):
    weights: jnp.ndarray  # (K,)
    means: jnp.ndarray    # (K, D)
    covs: jnp.ndarray     # (K, D, D)


def _log_gaussian(x: jnp.ndarray, mean: jnp.ndarray,
                  cov: jnp.ndarray) -> jnp.ndarray:
    """x: (N, D); mean: (D,); cov: (D, D) -> (N,) log N(x | mean, cov)."""
    D = x.shape[-1]
    chol = jnp.linalg.cholesky(cov)
    diff = x - mean
    sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True).T
    maha = (sol ** 2).sum(-1)
    logdet = 2.0 * plog(jnp.diagonal(chol)).sum()
    return -0.5 * (D * jnp.log(2 * jnp.pi) + logdet + maha)


def _log_prob_components(params: GMMParams, x: jnp.ndarray) -> jnp.ndarray:
    """(N, K) log w_k + log N(x | mu_k, Sigma_k)."""
    lps = jax.vmap(lambda m, c: _log_gaussian(x, m, c))(
        params.means, params.covs)  # (K, N)
    return lps.T + plog(params.weights)[None, :]


class GaussianMixture:
    """sklearn-like API: fit / predict / predict_proba / score."""

    def __init__(self, n_components: int = 3, n_init: int = 10,
                 n_iter: int = 100, reg_covar: float = 1e-6,
                 seed: int = 0):
        self.K = n_components
        self.n_init = n_init
        self.n_iter = n_iter
        self.reg_covar = reg_covar
        self.seed = seed
        self.params: Optional[GMMParams] = None
        self.log_likelihood_: float = -np.inf

    # -- EM ------------------------------------------------------------

    def _init_params(self, key, x: jnp.ndarray) -> GMMParams:
        N, D = x.shape
        idx = jax.random.choice(key, N, (self.K,), replace=False)
        means = x[idx]
        cov0 = jnp.cov(x.T) + self.reg_covar * jnp.eye(D)
        covs = jnp.broadcast_to(cov0, (self.K, D, D))
        return GMMParams(jnp.full((self.K,), 1.0 / self.K), means, covs)

    def _em(self, params: GMMParams, x: jnp.ndarray):
        D = x.shape[-1]
        eye = jnp.eye(D)

        def step(params, _):
            lp = _log_prob_components(params, x)     # (N, K)
            ll = plogsumexp(lp, axis=-1).sum()
            resp = psoftmax(lp, axis=-1)             # (N, K)
            nk = resp.sum(0) + 1e-10
            weights = nk / nk.sum()
            means = (resp.T @ x) / nk[:, None]
            diff = x[:, None, :] - means[None]       # (N, K, D)
            covs = jnp.einsum("nk,nkd,nke->kde", resp, diff, diff) \
                / nk[:, None, None] + self.reg_covar * eye
            return GMMParams(weights, means, covs), ll

        params, lls = jax.lax.scan(step, params, None, length=self.n_iter)
        return params, lls[-1]

    def fit(self, x) -> "GaussianMixture":
        x = jnp.asarray(np.asarray(x, np.float32))
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.n_init)
        inits = jax.vmap(lambda k: self._init_params(k, x))(keys)
        # all restarts in parallel (reference: sklearn n_init=10 sequential)
        run = jax.jit(jax.vmap(lambda p: self._em(p, x)))
        finals, lls = run(inits)
        best = int(jnp.argmax(lls))
        self.params = jax.tree_util.tree_map(lambda a: a[best], finals)
        self.log_likelihood_ = float(lls[best])
        return self

    # -- inference -----------------------------------------------------

    def predict_proba(self, x) -> np.ndarray:
        lp = _log_prob_components(self.params,
                                  jnp.asarray(np.asarray(x, np.float32)))
        return np.asarray(psoftmax(lp, axis=-1))

    def predict(self, x) -> np.ndarray:
        return self.predict_proba(x).argmax(-1)

    def score_samples(self, x) -> np.ndarray:
        lp = _log_prob_components(self.params,
                                  jnp.asarray(np.asarray(x, np.float32)))
        return np.asarray(plogsumexp(lp, axis=-1))


class SimpleRegimeDetector:
    """GMM regime detector over engineered features
    (reference: train_simple.py:10-28)."""

    def __init__(self, n_regimes: int = 3, n_init: int = 10, seed: int = 0):
        self.n_regimes = n_regimes
        self.gmm = GaussianMixture(n_components=n_regimes, n_init=n_init,
                                   seed=seed)
        self.fitted = False

    def fit(self, features) -> "SimpleRegimeDetector":
        self.gmm.fit(features)
        self.fitted = True
        return self

    def predict_regime(self, features) -> np.ndarray:
        return self.gmm.predict(features)

    def predict_proba(self, features) -> np.ndarray:
        return self.gmm.predict_proba(features)


def prepare_regime_features(returns: np.ndarray,
                            lookback: int = 20) -> np.ndarray:
    """Engineered feature matrix from a (T, A) return panel
    (reference: train_simple.py:63-100's feature recipe: level, dispersion,
    momentum, downside stats across rolling windows)."""
    import pandas as pd

    r = pd.DataFrame(np.asarray(returns))
    mean_ret = r.mean(axis=1)
    feats = pd.DataFrame({
        "ret": mean_ret,
        "vol": mean_ret.rolling(lookback).std(),
        "skew": mean_ret.rolling(lookback).skew(),
        "kurt": mean_ret.rolling(lookback).kurt(),
        "mom5": mean_ret.rolling(5).sum(),
        "mom20": mean_ret.rolling(lookback).sum(),
        "downside": mean_ret.clip(upper=0).rolling(lookback).std(),
        "dispersion": r.std(axis=1),
        "corr": r.rolling(lookback).corr().groupby(level=0).mean()
                 .mean(axis=1) if r.shape[1] > 1 else mean_ret * 0,
        "drawdown": (mean_ret.cumsum().cummax() - mean_ret.cumsum()),
        "up_ratio": (mean_ret > 0).rolling(lookback).mean(),
        "abs_ret": mean_ret.abs().rolling(lookback).mean(),
        "range": (mean_ret.rolling(5).max() - mean_ret.rolling(5).min()),
    })
    feats = feats.dropna()
    vals = feats.values.astype(np.float32)
    mu, sd = vals.mean(0), vals.std(0) + 1e-8
    return (vals - mu) / sd
