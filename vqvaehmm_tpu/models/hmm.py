"""Stationary hidden Markov model with exact native inference.

Covers — natively, without TensorFlow Probability — everything the
reference's `hmm.py` delegates to `tfd.HiddenMarkovModel` (reference:
hmm.py:30-42: construction from initial/transition/observation
distributions, `mean()`, `log_prob()`), and fills the reference's
deliberately-unimplemented stationary-transition hole
(VQ_VAE_HMM_fixed.py:50-51).  Also provides Baum-Welch EM over discrete
code-index sequences, the `hmm.train_em` step of the reference's VQ design
sketch (pseudocode.txt:26-27).

All inference runs through the log-space scan kernels in ops/hmm.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import hmm as ops
from ..ops.precise import pexp, plog, plogsumexp


class GaussianEmission(NamedTuple):
    loc: jnp.ndarray    # (K,) or (K, D)
    scale: jnp.ndarray  # same shape

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B,T) scalar or (B,T,D) -> (B,T,K)."""
        loc, scale = self.loc, self.scale
        if loc.ndim == 1:
            z = (x[..., None] - loc) / scale
            return -0.5 * z * z - plog(scale) - 0.5 * math.log(2 * math.pi)
        z = (x[..., None, :] - loc) / scale  # (B,T,K,D)
        lp = -0.5 * z * z - plog(scale) - 0.5 * math.log(2 * math.pi)
        return lp.sum(-1)

    def mean_per_state(self) -> jnp.ndarray:
        return self.loc


class CategoricalEmission(NamedTuple):
    logits: jnp.ndarray  # (K, V) observation log-prob per state

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B,T) int observations -> (B,T,K)."""
        log_B = self.logits - plogsumexp(self.logits, axis=-1, keepdims=True)
        return log_B.T[x]  # (B,T,K) via (V,K) lookup

    def mean_per_state(self) -> jnp.ndarray:
        probs = pexp(self.logits - plogsumexp(self.logits, -1, keepdims=True))
        v = jnp.arange(self.logits.shape[-1], dtype=probs.dtype)
        return (probs * v).sum(-1)


class HiddenMarkovModel:
    """Stationary HMM over K states.

    Construction mirrors the reference's TFP call
    (initial/transition/observation; reference hmm.py:30-34) but from plain
    arrays; `num_steps` fixes the horizon for `mean()`/`sample()` defaults.
    """

    def __init__(self, initial_probs, transition_probs, emission,
                 num_steps: Optional[int] = None):
        self.log_pi = plog(jnp.asarray(initial_probs, jnp.float32))
        self.log_A = plog(jnp.asarray(transition_probs, jnp.float32))
        self.emission = emission
        self.num_steps = num_steps
        self.K = self.log_pi.shape[0]

    # -- state-marginal utilities ------------------------------------

    def state_marginals(self, num_steps: Optional[int] = None) -> jnp.ndarray:
        """(T, K) marginal state distributions pi @ A^t."""
        T = num_steps or self.num_steps
        A = pexp(self.log_A)

        def step(p, _):
            p = p @ A
            return p, p

        p0 = pexp(self.log_pi)
        _, ps = jax.lax.scan(step, p0, None, length=T - 1)
        return jnp.concatenate([p0[None], ps], axis=0)

    def mean(self, num_steps: Optional[int] = None) -> jnp.ndarray:
        """E[x_t] per step (reference hmm.py:38: model.mean())."""
        marg = self.state_marginals(num_steps)
        mps = self.emission.mean_per_state()
        if mps.ndim == 1:
            return marg @ mps
        return marg @ mps  # (T, D)

    # -- inference ----------------------------------------------------

    def _log_obs(self, x) -> Tuple[jnp.ndarray, bool]:
        """Emission log-probs (B,T,K); accepts unbatched sequences too."""
        x = jnp.asarray(x)
        if isinstance(self.emission, CategoricalEmission) or \
                self.emission.loc.ndim == 1:
            unbatched = x.ndim == 1   # obs are scalars / ints per step
        else:
            unbatched = x.ndim == 2   # obs are (T, D)
        if unbatched:
            x = x[None]
        return self.emission.log_prob(x), unbatched

    def log_prob(self, x, lengths=None) -> jnp.ndarray:
        """Sequence log-likelihood (reference hmm.py:42: model.log_prob)."""
        log_obs, squeeze = self._log_obs(x)
        ll = ops.forward(self.log_pi, self.log_A, log_obs, lengths
                         ).log_likelihood
        return ll[0] if squeeze else ll

    def posterior_marginals(self, x, lengths=None) -> jnp.ndarray:
        log_obs, squeeze = self._log_obs(x)
        g = ops.posterior_marginals(self.log_pi, self.log_A, log_obs, lengths)
        return g[0] if squeeze else g

    def posterior_mode(self, x, lengths=None,
                       use_pallas: Optional[bool] = None) -> jnp.ndarray:
        """Viterbi MAP state path.  use_pallas=None auto-dispatches to the
        fused doubling-scan kernel on TPU (wins at every measured shape —
        BENCH_NOTES.md); T past its VMEM bound takes the chunked kernel,
        and only enormous K (no VMEM-legal chunk) falls back to scan."""
        log_obs, squeeze = self._log_obs(x)
        if use_pallas is None:
            from ..ops.pallas_hmm import viterbi_dispatchable

            # one gate, kept beside the kernels (bounds backend, dtype,
            # lane tiling AND VMEM)
            use_pallas = viterbi_dispatchable(
                log_obs.shape[1], log_obs.shape[2], log_obs.dtype)
        if use_pallas:
            from ..ops.pallas_hmm import viterbi_auto

            v = viterbi_auto(self.log_pi, self.log_A, log_obs, lengths)
        else:
            v = ops.viterbi(self.log_pi, self.log_A, log_obs, lengths)
        return v.states[0] if squeeze else v.states

    def sample(self, key: jax.Array, num_steps: Optional[int] = None,
               batch: int = 1):
        """Ancestral sample of (states, observations)."""
        T = num_steps or self.num_steps
        kz, kx = jax.random.split(key)
        states = ops.sample(kz, self.log_pi, self.log_A, T, batch)
        if isinstance(self.emission, CategoricalEmission):
            logits = self.emission.logits[states]
            obs = jax.random.categorical(kx, logits)
        else:
            loc = self.emission.loc[states]
            scale = self.emission.scale[states]
            obs = loc + scale * jax.random.normal(kx, loc.shape)
        return states, obs


class EMResult(NamedTuple):
    model: "HiddenMarkovModel"
    log_likelihoods: jnp.ndarray  # (n_iters,) total data log-likelihood


def fit_categorical_em(codes: jnp.ndarray, K: int, V: int,
                       n_iters: int = 50, seed: int = 0,
                       lengths: Optional[jnp.ndarray] = None,
                       pseudocount: float = 1e-3,
                       n_init: int = 4,
                       sticky: Optional[float] = None) -> EMResult:
    """Baum-Welch EM for an HMM with categorical emissions over code indices.

    This is `hmm.train_em(all_code_indices)` from the reference design
    sketch (pseudocode.txt:26-27), fully batched: E-step = forward-backward
    scans over all sequences at once; M-step = masked expected-count
    updates.  codes: (B, T) int in [0, V).

    EM is multimodal; `n_init` random restarts run *in parallel* via vmap
    (one batched program, not n sequential fits) and the best final
    log-likelihood wins.

    sticky: when set (e.g. 0.95), every SECOND restart initializes the
    transition matrix at sticky*I + (1-sticky)/K instead of a Dirichlet
    draw, biasing those chains toward the slow-switching mode — for
    regime discovery over fast per-timestep symbols the likelihood
    surface has fast-switching local optima that near-uniform inits
    fall into (observed on the market fixture's VQ codes).  The best
    final log-likelihood still wins across ALL restarts.
    """
    codes = jnp.asarray(codes, jnp.int32)
    B, T = codes.shape

    valid = (jnp.arange(T)[None, :] < lengths[:, None]) if lengths is not None \
        else jnp.ones((B, T), bool)
    onehot = jax.nn.one_hot(codes, V) * valid[..., None]  # (B,T,V)

    def init_one(key, use_sticky):
        k1, k2, k3 = jax.random.split(key, 3)
        A_rand = jax.random.dirichlet(k2, jnp.full(K, 2.0), shape=(K,))
        if sticky is not None:
            A_sticky = (sticky * jnp.eye(K)
                        + (1.0 - sticky) / K * jnp.ones((K, K)))
            A0 = jnp.where(use_sticky, A_sticky, A_rand)
        else:
            A0 = A_rand
        return (plog(jax.random.dirichlet(k1, jnp.ones(K))),
                plog(A0),
                plog(jax.random.dirichlet(k3, jnp.ones(V), shape=(K,))))

    def em_step(carry, _):
        log_pi, log_A, log_Bm = carry
        log_obs = log_Bm.T[codes]  # (B,T,K)
        sm = ops.smoothing(log_pi, log_A, log_obs, lengths)
        # ops.smoothing zeroes xi at invalid pairs (ragged batches)
        gamma, xi = sm.gamma, sm.xi
        gamma_m = gamma * valid[..., None]

        pi_new = gamma[:, 0].sum(0) + pseudocount
        A_new = xi.sum((0, 1)) + pseudocount
        B_new = jnp.einsum("btk,btv->kv", gamma_m, onehot) + pseudocount

        new = (plog(pi_new / pi_new.sum()),
               plog(A_new / A_new.sum(-1, keepdims=True)),
               plog(B_new / B_new.sum(-1, keepdims=True)))
        return new, sm.log_likelihood.sum()

    def run_one(key, use_sticky):
        return jax.lax.scan(em_step, init_one(key, use_sticky), None,
                            length=n_iters)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_init)
    flags = (jnp.arange(n_init) % 2) == 0  # even restarts sticky (if set)
    (log_pis, log_As, log_Bms), lls = jax.vmap(run_one)(keys, flags)
    best = jnp.argmax(lls[:, -1])
    log_pi = log_pis[best]
    log_A = log_As[best]
    log_Bm = log_Bms[best]
    model = HiddenMarkovModel(pexp(log_pi), pexp(log_A),
                              CategoricalEmission(log_Bm), num_steps=T)
    return EMResult(model, lls[best])


def fit_transitions_em(log_obs: jnp.ndarray, n_iters: int = 50,
                       lengths: Optional[jnp.ndarray] = None,
                       pseudocount: float = 1e-3,
                       init_stickiness: float = 0.9
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EM over (pi, A) ONLY, with the emission model held fixed.

    Adds exact temporal dynamics on top of ANY per-step evidence: pass
    log p(x_t | z_t = k) as `log_obs: (B, T, K)` — e.g. a fitted GMM's
    per-component log-densities, a classifier's log-probs — and get back
    (log_pi, log_A, log_likelihoods (n_iters,)).  Decode afterwards with
    ops.hmm.viterbi / posterior_marginals using the same log_obs.

    This isolates the value of the chain itself: the emission family is
    identical to the static model's, so any accuracy gain is purely the
    temporal smoothing (used by scripts/fixture_model_compare.py to
    compare the reference's static GMM detector, train_simple.py:10-28,
    against the same GMM + learned dynamics).
    """
    log_obs = jnp.asarray(log_obs, jnp.float32)
    B, T, K = log_obs.shape
    A0 = jnp.full((K, K), (1.0 - init_stickiness) / max(K - 1, 1))
    A0 = A0.at[jnp.arange(K), jnp.arange(K)].set(
        init_stickiness if K > 1 else 1.0)

    def em_step(carry, _):
        log_pi, log_A = carry
        sm = ops.smoothing(log_pi, log_A, log_obs, lengths)
        valid = (jnp.arange(T)[None, :] < lengths[:, None]) \
            if lengths is not None else jnp.ones((B, T), bool)
        pi_new = (sm.gamma[:, 0] * valid[:, :1]).sum(0) + pseudocount
        A_new = sm.xi.sum((0, 1)) + pseudocount  # xi zeroed at invalid pairs
        new = (plog(pi_new / pi_new.sum()),
               plog(A_new / A_new.sum(-1, keepdims=True)))
        return new, sm.log_likelihood.sum()

    init = (plog(jnp.full((K,), 1.0 / K)), plog(A0))
    (log_pi, log_A), lls = jax.lax.scan(em_step, init, None, length=n_iters)
    return log_pi, log_A, lls


def fit_gaussian_em(x: jnp.ndarray, K: int, n_iters: int = 50,
                    seed: int = 0,
                    lengths: Optional[jnp.ndarray] = None,
                    min_scale: float = 1e-3,
                    n_init: int = 4) -> EMResult:
    """Baum-Welch EM for an HMM with diagonal-Gaussian emissions.

    The classic regime-switching model the reference approximates with a
    GMM (train_simple.py) but with real temporal dynamics.  x: (B, T) or
    (B, T, D) observations; returns a fitted HiddenMarkovModel with
    GaussianEmission.  Multi-restart via vmap, best log-likelihood wins.
    """
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 2:
        x = x[..., None]
    B, T, D = x.shape

    valid = (jnp.arange(T)[None, :] < lengths[:, None]) if lengths is not None \
        else jnp.ones((B, T), bool)
    validf = valid.astype(jnp.float32)

    flat = x.reshape(-1, D)
    data_mean = (flat * validf.reshape(-1, 1)).sum(0) / validf.sum()
    data_std = jnp.sqrt(((flat - data_mean) ** 2
                         * validf.reshape(-1, 1)).sum(0) / validf.sum())

    def init_one(key):
        k1, k2, k3 = jax.random.split(key, 3)
        log_pi = plog(jax.random.dirichlet(k1, jnp.ones(K)))
        log_A = plog(jax.random.dirichlet(k2, jnp.full(K, 2.0), shape=(K,)))
        # means spread around the data distribution
        loc = data_mean + data_std * jax.random.normal(k3, (K, D))
        scale = jnp.broadcast_to(data_std, (K, D)) + min_scale
        return log_pi, log_A, loc, scale

    def em_step(carry, _):
        log_pi, log_A, loc, scale = carry
        em = GaussianEmission(loc, scale)
        log_obs = em.log_prob(x)
        sm = ops.smoothing(log_pi, log_A, log_obs, lengths)
        # ops.smoothing zeroes xi at invalid pairs (ragged batches)
        gamma, xi = sm.gamma, sm.xi
        g = gamma * validf[..., None]  # (B,T,K)

        nk = jnp.maximum(g.sum((0, 1)), 1e-6)  # (K,)
        pi_new = gamma[:, 0].sum(0) + 1e-3
        A_new = xi.sum((0, 1)) + 1e-3
        loc_new = jnp.einsum("btk,btd->kd", g, x) / nk[:, None]
        var_new = jnp.einsum("btk,btkd->kd", g,
                             (x[:, :, None, :] - loc_new) ** 2) / nk[:, None]
        scale_new = jnp.sqrt(var_new) + min_scale
        new = (plog(pi_new / pi_new.sum()),
               plog(A_new / A_new.sum(-1, keepdims=True)),
               loc_new, scale_new)
        return new, sm.log_likelihood.sum()

    def run_one(key):
        return jax.lax.scan(em_step, init_one(key), None, length=n_iters)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_init)
    (log_pis, log_As, locs, scales), lls = jax.vmap(run_one)(keys)
    best = jnp.argmax(lls[:, -1])
    model = HiddenMarkovModel(
        pexp(log_pis[best]), pexp(log_As[best]),
        GaussianEmission(locs[best] if D > 1 else locs[best][:, 0],
                         scales[best] if D > 1 else scales[best][:, 0]),
        num_steps=T)
    return EMResult(model, lls[best])
