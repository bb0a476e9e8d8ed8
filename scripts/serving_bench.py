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

# persistent compile cache (CLAUDE.md: remote compiles cost minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def device_goodput(model, T: int):
    """The hardware truth the HTTP loop (through a dev tunnel) obscures:
    saturated marginal device cost of the serving forward per batch size.
    A B=16 forward costs nearly the same device time as B=1, so batching
    multiplies goodput (seqs/sec/chip) by ~B — this is what micro-batching
    buys on co-located serving where the RPC overhead is microseconds.

    Methodology: M forwards fused per device call via lax.scan, two call
    sizes, difference the medians (the saturated two-point method of
    BENCH_NOTES.md 'Measurement-methodology correction')."""
    import jax
    import jax.numpy as jnp

    C = model.cfg.model.input_dim
    params, m = model.params, model.model

    rng = np.random.default_rng(0)
    rows = []
    for B in (1, 8, 16, 32, 64):
        x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
        vt = jnp.asarray(T, jnp.int32)

        def make(R):
            @jax.jit
            def f():
                def body(c, i):
                    mu, lv, q = m.infer_forward(
                        params, x + (i * 1e-7).astype(jnp.float32),
                        valid_to=vt)
                    return c + jnp.sum(q[:, 0, -1]) + jnp.sum(mu[:, 0, -1]), \
                        None
                tot, _ = jax.lax.scan(body, jnp.zeros(()),
                                      jnp.arange(R, dtype=jnp.int32))
                return tot
            return f

        from vqvaehmm_tpu.utils.benchmarking import saturated_marginal

        us, _ = saturated_marginal(make, est_us=10.0 * max(1, B // 8),
                                   floor_ms=60.0)
        rows.append((B, us, B / us * 1e6))
        print(f"device forward B={B:2d}: {us:7.1f} us/call   "
              f"{B / us * 1e6:9.0f} seqs/sec/chip", file=sys.stderr)
    return rows


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
            b.warmup([args.T])  # compile the whole dispatch ladder up front
            r = hammer(b.infer, args.clients, args.seconds, x)
            eff = b.requests / max(b.dispatches, 1)
            print(f"batched<= {max_batch:2d}: {r[0]:8.1f} req/s   "
                  f"p50 {r[1]:6.1f} ms   p99 {r[2]:6.1f} ms   "
                  f"(avg {eff:.1f} req/dispatch)", file=sys.stderr)
            b.close()
        rows = device_goodput(model, args.T)
        print(json.dumps({
            "per_request_rps": round(solo[0], 1),
            "batched_rps": round(r[0], 1),
            "http_speedup": round(r[0] / solo[0], 2),
            "device_goodput_seqs_per_sec": {
                f"B={B}": round(g) for B, _, g in rows},
            "device_batching_gain": round(rows[-1][2] / rows[0][2], 1),
        }))


if __name__ == "__main__":
    main()
