"""Calibration workflow example (reference: examples/calibration_example.py,
with the API-drift bugs fixed — the reference example calls methods that
don't exist on the library, SURVEY.md section 4.1; this one uses the real
API surface: get_pr_curve, evaluate_quality, best, get_curve, optimize,
max_iter).

Run: python examples/calibration_example.py
"""

import numpy as np

from vqvaehmm_tpu.calibration import (EmpiricalStoppingCriteria,
                                      EvaluationLoop,
                                      PrecisionRecallOptimizer,
                                      SignalNoiseController,
                                      ThresholdCalibrator,
                                      evaluate_with_tradeoffs)


def main():
    rng = np.random.default_rng(0)
    n = 1000
    targets = rng.integers(0, 2, n)
    preds = np.clip(0.55 * targets + rng.normal(0.25, 0.15, n), 0, 1)

    # 1. precision/recall-constrained calibration
    cal = ThresholdCalibrator(min_precision=0.7, min_recall=0.5)
    best = cal.calibrate(preds, targets)
    print(f"Optimal threshold: {best.threshold:.3f}")
    print(f"F1 Score: {best.f1_score:.3f} "
          f"(P={best.precision:.3f}, R={best.recall:.3f})")
    prec, rec, thr = cal.get_pr_curve()
    print(f"PR curve points: {len(prec)}")

    # 2. signal/noise control
    controller = SignalNoiseController(target_signal_ratio=0.3)
    threshold = controller.find_threshold(preds)
    quality = controller.evaluate_quality(preds, targets, threshold)
    print(f"signal threshold {threshold:.3f} -> quality {quality}")

    # 3. empirical stopping
    stopping = EmpiricalStoppingCriteria(patience=5, min_delta=0.001)
    for epoch in range(50):
        f1 = 0.8 - 0.3 * np.exp(-epoch / 5) + rng.normal(0, 0.002)
        if stopping.should_stop({"f1_score": f1}):
            print(f"stopped at epoch {epoch}, best={stopping.best:.4f}")
            break
    print(f"converged: {stopping.is_converged()}")

    # 4. weighted precision/recall search + tradeoff table
    opt = PrecisionRecallOptimizer(precision_weight=0.7)
    thresh, metrics = opt.optimize(preds, targets)
    print(f"precision-weighted threshold {thresh:.3f}: {metrics}")
    print(evaluate_with_tradeoffs(preds, targets).head())

    # 5. evaluation loop with stopping
    batches = [(preds[i::4], targets[i::4]) for i in range(4)]
    loop = EvaluationLoop(ThresholdCalibrator(),
                          EmpiricalStoppingCriteria(patience=2))
    out = loop.run(lambda x: x, batches, max_iter=20)
    print(f"loop: {out['iterations']} iters, "
          f"best F1 {out['best_result'].f1_score:.3f}")


if __name__ == "__main__":
    main()
