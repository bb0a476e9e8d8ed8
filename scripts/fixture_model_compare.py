"""Regime recovery on the committed market fixture: GMM stack vs
Gaussian-HMM (Baum-Welch) vs the VAE-HMM decode modes.

The reference pitches its GMM detector as the "improved" system
(train_simple.py:10-28: sklearn GaussianMixture over 13 engineered
features, no temporal model).  This script scores that stack against a
real temporal model — `models/hmm.fit_gaussian_em` (exact Baum-Welch,
multi-restart, Viterbi decode) — on the SAME features and the SAME
per-day ground-truth labels shipped with the market fixture
(tests/fixtures/market_fixture.csv, `__regime__` column), and prints the
VAE-HMM window-level numbers (artifacts/quality_fixture.json) alongside
for context.

Scoring domains differ: GMM/HMM decode the full daily panel (one long
sequence); the VAE numbers are over the recipe's overlapping windows —
rates are comparable, denominators are not identical.

Run: JAX_PLATFORMS=cpu python scripts/fixture_model_compare.py
Prints ONE JSON line on stdout; writes artifacts/fixture_model_compare.json.
"""

from __future__ import annotations

import itertools
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

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "market_fixture.csv")


def best_perm_accuracy(pred, true, K):
    best = 0.0
    for perm in itertools.permutations(range(K)):
        best = max(best, float((np.asarray(perm)[pred] == true).mean()))
    return best


def best_perm_balanced(pred, true, K):
    """Balanced accuracy (mean per-class recall) under the raw-accuracy-
    maximizing permutation.  The fixture is ~90/8/2 imbalanced, so raw
    accuracy alone scores a constant calm-regime predictor at ~0.9;
    balanced accuracy scores it at 1/3 and exposes rare-regime
    blindness (see BENCH_NOTES 'Class imbalance and balanced accuracy')."""
    best, best_perm = 0.0, None
    for perm in itertools.permutations(range(K)):
        acc = float((np.asarray(perm)[pred] == true).mean())
        if acc > best or best_perm is None:
            best, best_perm = acc, perm
    p = np.asarray(best_perm)[pred]
    recalls = [float((p[true == k] == k).mean())
               for k in range(K) if (true == k).any()]
    return float(np.mean(recalls))


def switch_rate(states):
    return float((np.diff(np.asarray(states)) != 0).mean())


def main():
    from vqvaehmm_tpu.data.market import load_fixture_frames
    from vqvaehmm_tpu.models.gmm import (SimpleRegimeDetector,
                                         prepare_regime_features)
    from vqvaehmm_tpu.models.hmm import fit_gaussian_em, fit_transitions_em

    prices, _, regimes = load_fixture_frames(FIXTURE)
    assert regimes is not None, "fixture must carry __regime__ labels"
    returns = prices.pct_change().dropna()
    truth = regimes.loc[returns.index].values.astype(int)
    K = int(truth.max()) + 1

    feats = prepare_regime_features(returns.values.astype(np.float32))
    assert len(feats) == len(truth)

    out = {"days": len(truth), "K": K,
           "majority_share": round(float(np.bincount(truth).max()
                                         / truth.size), 4),
           "switch_rate_ground_truth": round(switch_rate(truth), 4)}

    # --- the reference's "improved" stack: static GMM over features ---
    det = SimpleRegimeDetector(n_regimes=K, seed=0)
    det.fit(feats)
    gmm_pred = np.asarray(det.predict_regime(feats))
    out["regime_acc_gmm"] = round(best_perm_accuracy(gmm_pred, truth, K), 4)
    out["regime_bal_acc_gmm"] = round(best_perm_balanced(gmm_pred, truth, K), 4)
    out["switch_rate_gmm"] = round(switch_rate(gmm_pred), 4)

    # --- the SAME GMM emissions + learned dynamics: an HMM whose
    # emission densities are exactly the fitted GMM components, with
    # (pi, A) learned by EM (models/hmm.fit_transitions_em) — isolates
    # the value of the chain with the emission family held fixed ---
    from vqvaehmm_tpu.models.gmm import _log_prob_components
    from vqvaehmm_tpu.ops import hmm as hmm_ops
    import jax.numpy as jnp

    log_obs = np.asarray(_log_prob_components(
        det.gmm.params, det._norm(feats)))[None]       # (1, T, K)
    log_pi, log_A, _ = fit_transitions_em(log_obs, n_iters=40)
    chain_pred = np.asarray(
        hmm_ops.viterbi(log_pi, log_A, log_obs).states)[0]
    out["regime_acc_gmm_plus_chain_viterbi"] = round(
        best_perm_accuracy(chain_pred, truth, K), 4)
    out["regime_bal_acc_gmm_plus_chain_viterbi"] = round(
        best_perm_balanced(chain_pred, truth, K), 4)
    out["switch_rate_gmm_plus_chain_viterbi"] = round(
        switch_rate(chain_pred), 4)

    # --- fully-learned Baum-Welch Gaussian-HMM (diag emissions) ---
    mu = feats.mean(0, keepdims=True)
    sd = feats.std(0, keepdims=True) + 1e-8
    z = ((feats - mu) / sd)[None]                      # (1, T, D)
    em = fit_gaussian_em(z, K=K, n_iters=40, seed=0, n_init=4)
    hmm_pred = np.asarray(em.model.posterior_mode(z))[0]
    out["regime_acc_gaussian_hmm_viterbi"] = round(
        best_perm_accuracy(hmm_pred, truth, K), 4)
    out["regime_bal_acc_gaussian_hmm_viterbi"] = round(
        best_perm_balanced(hmm_pred, truth, K), 4)
    out["switch_rate_gaussian_hmm_viterbi"] = round(switch_rate(hmm_pred), 4)

    # --- held-out split: fit GMM (+ chain) on the first 80% of days,
    # score the last 20% — the in-sample rows above could in principle
    # flatter the fitted models; this one cannot ---
    cut = int(0.8 * len(truth))
    det_h = SimpleRegimeDetector(n_regimes=K, seed=0)
    det_h.fit(feats[:cut])
    pred_h = np.asarray(det_h.predict_regime(feats[cut:]))
    out["heldout_regime_acc_gmm"] = round(
        best_perm_accuracy(pred_h, truth[cut:], K), 4)
    out["heldout_regime_bal_acc_gmm"] = round(
        best_perm_balanced(pred_h, truth[cut:], K), 4)
    out["heldout_switch_rate_gmm"] = round(switch_rate(pred_h), 4)

    lo_train = np.asarray(_log_prob_components(
        det_h.gmm.params, det_h._norm(feats[:cut])))[None]
    log_pi_h, log_A_h, _ = fit_transitions_em(lo_train, n_iters=40)
    lo_test = np.asarray(_log_prob_components(
        det_h.gmm.params, det_h._norm(feats[cut:])))[None]
    chain_h = np.asarray(
        hmm_ops.viterbi(log_pi_h, log_A_h, jnp.asarray(lo_test)).states)[0]
    out["heldout_regime_acc_gmm_plus_chain"] = round(
        best_perm_accuracy(chain_h, truth[cut:], K), 4)
    out["heldout_regime_bal_acc_gmm_plus_chain"] = round(
        best_perm_balanced(chain_h, truth[cut:], K), 4)
    out["heldout_switch_rate_gmm_plus_chain"] = round(
        switch_rate(chain_h), 4)
    out["heldout_switch_rate_ground_truth"] = round(
        switch_rate(truth[cut:]), 4)

    # --- VAE-HMM window-level numbers for context (committed artifact) ---
    art = os.path.join(os.path.dirname(FIXTURE), "..", "..", "artifacts")
    qf = os.path.join(art, "quality_fixture.json")
    if os.path.exists(qf):
        vae = json.load(open(qf))
        out["vae_hmm_windows"] = vae

    # --- true-VQ family window-level numbers (full_recipe.py stage vq) ---
    vqf = os.path.join(art, "vq_quality_fixture.json")
    if os.path.exists(vqf):
        vq = json.load(open(vqf))
        out["vqvae_hmm_windows"] = {
            k: v for k, v in vq.items()
            if k.startswith(("regime_", "switch_rate", "codebook"))}

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/fixture_model_compare.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
