"""Calibration module (reference: calibration.py) — behavior tests with
known-answer threshold problems."""

import numpy as np
import pytest

from vqvaehmm_tpu.calibration import (EmpiricalStoppingCriteria,
                                      EvaluationLoop,
                                      PrecisionRecallOptimizer,
                                      SignalNoiseController,
                                      ThresholdCalibrator,
                                      evaluate_with_tradeoffs)


@pytest.fixture
def separable(rng):
    """Perfectly separable: positives score ~0.9, negatives ~0.1."""
    n = 400
    targets = rng.integers(0, 2, n)
    preds = np.where(targets == 1, 0.9, 0.1) + rng.normal(0, 0.02, n)
    return preds, targets


def test_threshold_calibrator_finds_separator(separable):
    preds, targets = separable
    cal = ThresholdCalibrator(min_precision=0.7, min_recall=0.5)
    best = cal.calibrate(preds, targets)
    # any threshold strictly between the two clusters is a perfect separator
    assert 0.15 < best.threshold < 0.85
    assert best.f1_score > 0.99
    prec, rec, thr = cal.get_pr_curve()
    assert len(prec) == len(rec) == len(thr) == 100


def test_calibrator_falls_back_when_constraints_unreachable(rng):
    preds = rng.uniform(0, 1, 200)
    targets = rng.integers(0, 2, 200)  # no signal
    cal = ThresholdCalibrator(min_precision=0.99, min_recall=0.99)
    best = cal.calibrate(preds, targets)
    assert best is not None  # falls back to best-F1 (reference :42-44)


def test_signal_noise_controller(separable):
    preds, targets = separable
    ctrl = SignalNoiseController(target_signal_ratio=0.3)
    thresh = ctrl.find_threshold(preds)
    q = ctrl.evaluate_quality(preds, targets, thresh)
    assert abs(q["signal_ratio"] - 0.3) < 0.1
    assert 0 <= q["overall_quality"] <= 1


def test_empirical_stopping():
    stop = EmpiricalStoppingCriteria(patience=3, min_delta=0.01)
    vals = [0.5, 0.6, 0.7, 0.7, 0.7, 0.7]
    fired = [stop.should_stop({"f1_score": v}) for v in vals]
    assert fired[-1] is True
    assert not any(fired[:4])
    assert stop.is_converged(window=3)


def test_precision_recall_optimizer(separable):
    preds, targets = separable
    # precision-heavy: prefers high thresholds
    t_hi, m_hi = PrecisionRecallOptimizer(precision_weight=1.0).optimize(
        preds, targets)
    assert m_hi["precision"] >= 0.99
    t_lo, m_lo = PrecisionRecallOptimizer(precision_weight=0.0).optimize(
        preds, targets)
    assert m_lo["recall"] >= 0.99


def test_evaluation_loop(separable):
    preds, targets = separable

    def predict_fn(x):
        return x  # identity: batches already carry scores

    batches = [(preds[:200], targets[:200]), (preds[200:], targets[200:])]
    loop = EvaluationLoop(ThresholdCalibrator(),
                          EmpiricalStoppingCriteria(patience=2))
    out = loop.run(predict_fn, batches, max_iter=10)
    assert out["best_result"].f1_score > 0.95
    assert out["iterations"] <= 10


def test_evaluate_with_tradeoffs(separable):
    preds, targets = separable
    df = evaluate_with_tradeoffs(preds, targets)
    assert len(df) == 11
    assert {"precision", "recall", "threshold",
            "precision_weight"} <= set(df.columns)


def test_vectorized_sweep_matches_scalar_eval(rng):
    """The broadcasted all-thresholds sweep must agree exactly with
    independent single-threshold evaluations."""
    from vqvaehmm_tpu.calibration.calibrate import (_eval_threshold,
                                                    _eval_thresholds)

    preds = rng.uniform(size=300)
    targets = (rng.uniform(size=300) > 0.6).astype(int)
    thresholds = np.linspace(0.0, 1.0, 37)
    vec = _eval_thresholds(preds, targets, thresholds)
    for t, r in zip(thresholds, vec):
        s = _eval_threshold(preds, targets, float(t))
        assert (r.true_positives, r.false_positives, r.false_negatives) == \
            (s.true_positives, s.false_positives, s.false_negatives)
        np.testing.assert_allclose(
            [r.precision, r.recall, r.f1_score, r.signal_ratio],
            [s.precision, s.recall, s.f1_score, s.signal_ratio], rtol=1e-12)


def test_non_binary_targets_excluded_from_fp(rng):
    """Labels outside {0,1} (e.g. -1 directional) count toward neither
    tp nor fp — matching the scalar reference semantics."""
    from vqvaehmm_tpu.calibration.calibrate import _eval_threshold

    preds = np.array([0.9, 0.8, 0.7, 0.6])
    targets = np.array([1, -1, 0, -1])
    r = _eval_threshold(preds, targets, 0.5)
    assert (r.true_positives, r.false_positives, r.false_negatives) == \
        (1, 1, 0)
    assert r.precision == 0.5


def test_calibrate_regime_thresholds_per_regime(rng):
    """Per-regime one-vs-rest thresholds from mean posteriors
    (reference calibration.py:229-242): with cleanly separable
    posteriors every regime gets a threshold that separates its
    sequences from the rest."""
    from vqvaehmm_tpu.calibration import (ThresholdCalibrator,
                                          calibrate_regime_thresholds)

    K, T, per = 3, 20, 12
    B = K * per
    true = np.repeat(np.arange(K), per)
    probs = np.full((B, K, T), 0.1, np.float32)
    for i, k in enumerate(true):
        probs[i, k, :] = 0.8 + 0.1 * rng.random(T)

    th = calibrate_regime_thresholds(lambda d: probs, None, true, K)
    assert sorted(th) == [0, 1, 2]
    for k in range(K):
        preds = probs[:, k, :].mean(axis=1)
        # the returned threshold separates regime-k rows from the rest
        assert (preds[true == k] > th[k]).all()
        assert (preds[true != k] <= th[k]).all()
        # and equals a direct ThresholdCalibrator run on the same data
        cal = ThresholdCalibrator(min_precision=0.6, min_recall=0.5)
        want = cal.calibrate(preds, (true == k).astype(int)).threshold
        assert th[k] == want


def test_evaluation_loop_accepts_generators(separable):
    """A one-shot generator of batches must work for every iteration
    (the reference consumes a re-iterable DataLoader; the port
    materializes the iterable once)."""
    preds, targets = separable
    from vqvaehmm_tpu.calibration import (EmpiricalStoppingCriteria,
                                          EvaluationLoop,
                                          ThresholdCalibrator)

    loop = EvaluationLoop(ThresholdCalibrator(min_precision=0.1,
                                              min_recall=0.1),
                          EmpiricalStoppingCriteria(patience=2))
    gen = ((preds, targets) for _ in range(3))  # one-shot
    out = loop.run(lambda x: x, gen, max_iter=5)
    assert out["iterations"] >= 2  # iteration 2 did not see empty data

    import pytest

    with pytest.raises(ValueError, match="empty"):
        EvaluationLoop(ThresholdCalibrator(),
                       EmpiricalStoppingCriteria()).run(
            lambda x: x, iter(()), max_iter=3)
