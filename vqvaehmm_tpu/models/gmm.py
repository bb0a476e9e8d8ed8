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

from typing import NamedTuple, Optional

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
    """sklearn-like API: fit / predict / predict_proba / score /
    score_samples.  log_likelihood_ is the TOTAL training
    log-likelihood of the fitted params (sklearn's lower_bound_ is the
    per-sample mean — use score() for that)."""

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

        params, _ = jax.lax.scan(step, params, None, length=self.n_iter)
        # ll of the FINAL params (the scan's last ll is evaluated BEFORE
        # the last M-step — stale by one iteration, and restart ranking
        # would compare pre-update values)
        final_ll = plogsumexp(_log_prob_components(params, x),
                              axis=-1).sum()
        return params, final_ll

    def fit(self, x) -> "GaussianMixture":
        x = jnp.asarray(np.asarray(x, np.float32))
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.n_init)
        inits = jax.vmap(lambda k: self._init_params(k, x))(keys)
        # all restarts in parallel (reference: sklearn n_init=10
        # sequential).  x is a jit ARGUMENT, not a closure constant: a
        # closure would bake the data into the HLO (new data -> new
        # program -> full remote recompile per refit, the retrace trap
        # the project notes call out) — the executable is cached on the
        # class, keyed by shape via jit's own cache.
        if not hasattr(GaussianMixture, "_run_cache"):
            GaussianMixture._run_cache = {}
        key = (self.K, self.n_iter, self.reg_covar)
        if key not in GaussianMixture._run_cache:
            GaussianMixture._run_cache[key] = jax.jit(
                jax.vmap(self._em, in_axes=(0, None)))
        finals, lls = GaussianMixture._run_cache[key](inits, x)
        # a diverged restart's NaN ll must not win the argmax (NumPy/JAX
        # argmax returns the NaN index)
        lls = jnp.where(jnp.isnan(lls), -jnp.inf, lls)
        best = int(jnp.argmax(lls))
        self.params = jax.tree_util.tree_map(lambda a: a[best], finals)
        self.log_likelihood_ = float(lls[best])
        return self

    def _require_fitted(self):
        if self.params is None:
            raise ValueError(
                "GaussianMixture is not fitted; call fit(X) first")

    # -- inference -----------------------------------------------------

    def predict_proba(self, x) -> np.ndarray:
        self._require_fitted()
        lp = _log_prob_components(self.params,
                                  jnp.asarray(np.asarray(x, np.float32)))
        return np.asarray(psoftmax(lp, axis=-1))

    def predict(self, x) -> np.ndarray:
        return self.predict_proba(x).argmax(-1)

    def score_samples(self, x) -> np.ndarray:
        self._require_fitted()
        lp = _log_prob_components(self.params,
                                  jnp.asarray(np.asarray(x, np.float32)))
        return np.asarray(plogsumexp(lp, axis=-1))

    def score(self, x) -> float:
        """Mean per-sample log-likelihood (sklearn semantics)."""
        return float(self.score_samples(x).mean())


class SimpleRegimeDetector:
    """GMM regime detector over engineered features
    (reference: train_simple.py:10-28).

    The detector OWNS feature normalization: fit() learns mu/sd from
    its training features and every predict applies the SAME stats, so
    inference-time features are on the training scale (normalizing each
    panel independently silently shifted the posteriors; the stats are
    persisted by save_improved_system)."""

    def __init__(self, n_regimes: int = 3, n_init: int = 10, seed: int = 0):
        self.n_regimes = n_regimes
        self.gmm = GaussianMixture(n_components=n_regimes, n_init=n_init,
                                   seed=seed)
        self.fitted = False
        self.feature_mu: Optional[np.ndarray] = None
        self.feature_sd: Optional[np.ndarray] = None

    def _norm(self, features) -> np.ndarray:
        f = np.asarray(features, np.float32)
        if self.feature_mu is None:
            return f
        return (f - self.feature_mu) / self.feature_sd

    def fit(self, features) -> "SimpleRegimeDetector":
        f = np.asarray(features, np.float32)
        self.feature_mu = f.mean(0)
        self.feature_sd = f.std(0) + 1e-8
        self.gmm.fit(self._norm(f))
        self.fitted = True
        return self

    @classmethod
    def from_sklearn(cls, sk_gmm, feature_mu=None,
                     feature_sd=None) -> "SimpleRegimeDetector":
        """Build a fitted detector from a fitted sklearn GaussianMixture —
        the estimator inside the reference's `regime_detector.pkl`
        (train_simple.py:14-15, saved :190-192, reloaded inference.py:11-13).
        Accepts the sklearn estimator itself or any wrapper exposing
        `.gmm` (the reference's own SimpleRegimeDetector), duck-typed —
        sklearn is never imported here.

        Only covariance_type='full' (the reference's setting) maps onto
        GMMParams.  feature_mu/feature_sd: pass the z-scoring stats the
        original features were normalized with, if any — the reference
        normalizes inside ITS prepare_regime_features, so a migrating
        caller keeps feeding features normalized the same way (or
        provides the stats here and feeds raw features)."""
        sk = getattr(sk_gmm, "gmm", sk_gmm)
        for attr in ("weights_", "means_", "covariances_"):
            if not hasattr(sk, attr):
                raise ValueError(
                    f"{type(sk).__name__} has no {attr}; expected a "
                    "FITTED sklearn GaussianMixture (or a wrapper with "
                    "a .gmm attribute holding one)")
        covs = np.asarray(sk.covariances_, np.float32)
        means = np.asarray(sk.means_, np.float32)
        K = means.shape[0]
        if covs.shape != (K, means.shape[1], means.shape[1]):
            raise ValueError(
                f"covariances_ shape {covs.shape} is not full-covariance "
                f"(K, D, D); only covariance_type='full' (the reference's, "
                "train_simple.py:14) is supported")
        det = cls(n_regimes=K)
        det.gmm.params = GMMParams(jnp.asarray(sk.weights_, jnp.float32),
                                   jnp.asarray(means), jnp.asarray(covs))
        det.gmm.log_likelihood_ = float(getattr(sk, "lower_bound_", np.nan))
        if feature_mu is not None:
            if feature_sd is None:
                raise ValueError("feature_mu given without feature_sd")
            det.feature_mu = np.asarray(feature_mu, np.float32)
            det.feature_sd = np.asarray(feature_sd, np.float32)
        det.fitted = True
        return det

    def predict_regime(self, features) -> np.ndarray:
        self._require_fitted()
        return self.gmm.predict(self._norm(features))

    def predict_proba(self, features) -> np.ndarray:
        self._require_fitted()
        return self.gmm.predict_proba(self._norm(features))

    def _require_fitted(self):
        if not self.fitted:
            raise ValueError(
                "SimpleRegimeDetector is not fitted; call fit() first")


def prepare_regime_features(returns: np.ndarray,
                            lookback: int = 20) -> np.ndarray:
    """Engineered RAW feature matrix from a (T, A) return panel, one row
    per input day (reference: train_simple.py:63-100's recipe: level,
    dispersion, momentum, downside stats across rolling windows).

    Alignment contract: len(output) == len(returns) — warm-up and
    degenerate-window NaNs become 0 (the reference's np.nan_to_num,
    :98), NEVER dropped; dropping interior rows silently misaligned
    every consumer's `returns[-len(probs):]` tail pairing.
    Normalization is NOT done here: SimpleRegimeDetector learns mu/sd
    at fit() and reapplies them at predict, so train- and
    inference-time features share one scale (per-panel z-scoring both
    leaked full-sample statistics into walk-forwards and shifted the
    scale between panels)."""
    import pandas as pd

    r = pd.DataFrame(np.asarray(returns))
    mean_ret = r.mean(axis=1)
    feats = pd.DataFrame({
        "ret": mean_ret,
        "vol": mean_ret.rolling(lookback).std(),
        "skew": mean_ret.rolling(lookback).skew(),
        "kurt": mean_ret.rolling(lookback).kurt(),
        "mom5": mean_ret.rolling(5).sum(),
        # fixed 20-day momentum regardless of lookback (the name said
        # 20 but the window followed lookback)
        "mom20": mean_ret.rolling(20).sum(),
        "downside": mean_ret.clip(upper=0).rolling(lookback).std(),
        "dispersion": r.std(axis=1),
        "corr": r.rolling(lookback).corr().groupby(level=0).mean()
                 .mean(axis=1) if r.shape[1] > 1 else mean_ret * 0,
        "drawdown": (mean_ret.cumsum().cummax() - mean_ret.cumsum()),
        "up_ratio": (mean_ret > 0).rolling(lookback).mean(),
        "abs_ret": mean_ret.abs().rolling(lookback).mean(),
        "range": (mean_ret.rolling(5).max() - mean_ret.rolling(5).min()),
    })
    return np.nan_to_num(feats.values.astype(np.float32),
                         nan=0.0, posinf=0.0, neginf=0.0)
