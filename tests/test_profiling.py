"""utils/profiling.py: StepTimer accounting, MetricsLogger JSONL,
device_memory_stats (SURVEY.md section 5 — observability as a
first-class feature; the trace context is covered by
test_pipeline.py::test_pipeline_profile_dir_captures_trace)."""

import json
import time

from vqvaehmm_tpu.utils.profiling import (MetricsLogger, StepTimer,
                                          device_memory_stats)


def test_step_timer_excludes_warmup_and_accounts_items():
    timer = StepTimer(warmup=2)
    for i in range(5):
        with timer.step(items=10):
            time.sleep(0.01)
    s = timer.summary()
    assert s["steps"] == 3  # 5 recorded - 2 warmup
    assert s["mean_step_s"] >= 0.01
    assert s["p50_step_s"] >= 0.01
    # 3 timed steps x 10 items over >= 0.03s
    assert 0 < s["items_per_sec"] <= 3 * 10 / 0.03


def test_step_timer_empty_summary():
    assert StepTimer(warmup=3).summary() == {"steps": 0}


def test_metrics_logger_appends_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(1, loss=2.5)
    log.log(2, loss=1.25, lr=1e-3)
    log.close()
    # append-only across re-open
    log2 = MetricsLogger(path)
    log2.log(3, loss=0.5)
    log2.close()
    recs = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in recs] == [1, 2, 3]
    assert recs[1]["loss"] == 1.25 and recs[1]["lr"] == 1e-3
    assert all("time" in r for r in recs)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
    # values are either a stats dict or None where unsupported
    for v in stats.values():
        assert v is None or isinstance(v, dict)
