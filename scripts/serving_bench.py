"""Serving throughput: micro-batched vs per-request dispatch.

Measures sustained /infer throughput (requests/sec) through the in-process
serving stack under concurrent load, with and without dynamic
micro-batching (serve/batching.py), plus tail latency.  Run on the TPU to
see the real effect; on CPU it still demonstrates coalescing.

Usage: python scripts/serving_bench.py [--clients 32] [--seconds 5]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np


def make_model(tmp: str):
    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 64, "K": 3,
                  "hidden_dim2": 32, "u_dim": 4, "trans_hidden": 128},
        "checkpoint_path": os.path.join(tmp, "nonexistent"),
    }
    path = os.path.join(tmp, "cfg.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    from vqvaehmm_tpu.serve.app import InferenceModel

    return InferenceModel(path)


def hammer(infer, clients: int, seconds: float, x):
    """Concurrent closed-loop load; returns (req/s, p50 ms, p99 ms)."""
    stop = time.monotonic() + seconds
    lats: list[float] = []
    lock = threading.Lock()

    def client():
        mine = []
        while time.monotonic() < stop:
            t0 = time.monotonic()
            infer(x)
            mine.append(time.monotonic() - t0)
        with lock:
            lats.extend(mine)

    with concurrent.futures.ThreadPoolExecutor(max_workers=clients) as ex:
        list(ex.map(lambda _: client(), range(clients)))
    n = len(lats)
    return (n / seconds, 1e3 * float(np.percentile(lats, 50)),
            1e3 * float(np.percentile(lats, 99)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--T", type=int, default=200)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        model = make_model(tmp)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(5, args.T)).tolist()
        model.infer(x)  # compile the solo bucket

        solo = hammer(model.infer, args.clients, args.seconds, x)
        print(f"per-request: {solo[0]:8.1f} req/s   "
              f"p50 {solo[1]:6.1f} ms   p99 {solo[2]:6.1f} ms",
              file=sys.stderr)

        from vqvaehmm_tpu.serve.batching import BatchingModel

        for max_batch in (8, 16, 32):
            b = BatchingModel(model, max_batch=max_batch, max_wait_ms=2.0)
            b.infer(x)  # compile the batched bucket
            r = hammer(b.infer, args.clients, args.seconds, x)
            eff = b.requests / max(b.dispatches, 1)
            print(f"batched<= {max_batch:2d}: {r[0]:8.1f} req/s   "
                  f"p50 {r[1]:6.1f} ms   p99 {r[2]:6.1f} ms   "
                  f"(avg {eff:.1f} req/dispatch)", file=sys.stderr)
            b.close()
        print(json.dumps({"per_request_rps": round(solo[0], 1),
                          "batched_rps": round(r[0], 1),
                          "speedup": round(r[0] / solo[0], 2)}))


if __name__ == "__main__":
    main()
