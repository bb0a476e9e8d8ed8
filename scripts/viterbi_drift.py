"""Same-session Viterbi p50 drift tracker (round-3 VERDICT item 5).

BENCH_r02 recorded the fused Viterbi decode at 53.0 us/batch;
BENCH_r03 at 56.2 [55.4, 56.8] — non-overlapping, attributed to
day-to-day tunnel/chip-load variance but with no same-session evidence.
This script runs bench.py's EXACT measurement (saturated repeat-in-call
marginal, 5 windows) once per invocation and appends a timestamped
sample to artifacts/viterbi_drift.jsonl.  Invoked repeatedly across a
session (process-fresh, interleaved with other chip work) it records
the within-day spread that the published claim must sit inside;
`--summarize` prints the aggregate for BENCH_NOTES.

Run ON TPU:  python scripts/viterbi_drift.py [--summarize]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PATH = os.path.join("artifacts", "viterbi_drift.jsonl")


def summarize():
    samples = [json.loads(line) for line in open(PATH)]
    p50s = [s["p50_us"] for s in samples]
    span_h = (max(s["ts"] for s in samples)
              - min(s["ts"] for s in samples)) / 3600
    out = {"n_samples": len(samples), "span_hours": round(span_h, 2),
           "p50_us_min": min(p50s), "p50_us_max": max(p50s),
           "p50_us_median": sorted(p50s)[len(p50s) // 2],
           "window_lo_min": min(s["lo_us"] for s in samples),
           "window_hi_max": max(s["hi_us"] for s in samples)}
    print(json.dumps(out, indent=2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()
    if args.summarize:
        summarize()
        return

    import bench  # bench.py's exact recipe + env/caches

    p50, lo, hi = bench.bench_viterbi_p50()
    rec = {"ts": time.time(),
           "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "p50_us": round(p50, 2), "lo_us": round(lo, 2),
           "hi_us": round(hi, 2)}
    os.makedirs("artifacts", exist_ok=True)
    with open(PATH, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
