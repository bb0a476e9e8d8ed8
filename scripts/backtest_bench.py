"""Application-level benchmark: backtest regime extraction, batched-TPU vs
the reference's per-window loop.

The reference backtester re-encodes a 20-step window inside a Python loop
at every rebalance (reference backtesting.py:41-46); this framework
extracts the whole weight schedule in ONE batched posterior call
(backtest/backtester.py::_weight_schedule).  This script measures both
patterns end-to-end on a long walk and the full Backtester.run wall time.

Run on the TPU: python scripts/backtest_bench.py [--T 2016]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os

# persistent compile cache (CLAUDE.md: remote compiles cost minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def torch_reference_loop(x: np.ndarray, ts, window: int) -> float:
    """The reference pattern: torch-CPU encoder forward per rebalance
    window (softmax posterior of data[:, :, t-20:t])."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    C, H1, H2, K = x.shape[0], 64, 32, 3
    e1 = torch.nn.Conv1d(C, H1, 3, padding=1)
    e2 = torch.nn.Conv1d(H1, H2, 3, padding=1)
    e3 = torch.nn.Conv1d(H2, K, 1)
    xt = torch.from_numpy(x)

    with torch.no_grad():
        # warmup
        F.softmax(e3(F.relu(e2(F.relu(e1(xt[None, :, :window]))))), dim=1)
        t0 = time.perf_counter()
        for t in ts:
            win = xt[None, :, t - window:t]
            F.softmax(e3(F.relu(e2(F.relu(e1(win))))), dim=1)
        return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=2016)
    ap.add_argument("--rebalance", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.backtest import Backtester
    from vqvaehmm_tpu.models import HeadConfig, RegimePortfolioOptimizer

    T, window = args.T, 20
    rng = np.random.default_rng(0)
    n_assets = 10
    data = rng.normal(size=(1, 5, T)).astype(np.float32)
    prices = 100.0 * np.exp(np.cumsum(
        rng.normal(0, 0.01, size=(T, n_assets)), axis=0))
    returns = np.diff(prices, axis=0) / prices[:-1]

    model = make_model(5, 64, 3, 32, u_dim=4, trans_hidden=128)
    params = model.init(jax.random.PRNGKey(0))
    head = RegimePortfolioOptimizer(HeadConfig(K=3, n_assets=n_assets,
                                               hidden_dim=64))
    head_params = head.init(jax.random.PRNGKey(1))

    posterior_fn = jax.jit(lambda x: model.posterior(params, x))
    model_fn = jax.jit(lambda q: head(head_params, q))

    ts = [t for t in range(1, T)
          if t % args.rebalance == 0 and t > window]

    # ours: one batched posterior over all rebalance windows
    bt = Backtester()
    res = bt.run(model_fn, posterior_fn, data, prices, returns,
                 rebalance_freq=args.rebalance)  # warms the executables
    t0 = time.perf_counter()
    res = bt.run(model_fn, posterior_fn, data, prices, returns,
                 rebalance_freq=args.rebalance)
    ours_full = time.perf_counter() - t0

    # extraction-only timing (both sides measure the same subproblem);
    # the walk is tiled 10x into one call so the dev tunnel's per-call
    # RTT amortizes to a few percent instead of masquerading as device
    # time (one RTT over ~10 walks of device work)
    REP = 10
    windows = np.stack([data[0, :, t - window:t] for t in ts])
    tiled = jnp.asarray(np.concatenate([windows + 1e-6 * i
                                        for i in range(REP)]))
    np.asarray(posterior_fn(tiled))  # warm
    t0 = time.perf_counter()
    np.asarray(posterior_fn(tiled))
    ours_extract = (time.perf_counter() - t0) / REP

    try:
        torch_extract = torch_reference_loop(data[0], ts, window)
    except Exception as e:  # anchor, not a dependency
        log(f"torch loop failed: {e}")
        torch_extract = None

    log(f"windows: {len(ts)}  ours extract {ours_extract*1e3:.1f} ms  "
        f"torch loop {torch_extract*1e3 if torch_extract else -1:.1f} ms  "
        f"ours full backtest {ours_full*1e3:.1f} ms")
    print(json.dumps({
        "n_rebalances": len(ts),
        "extract_ms_batched_tpu": round(ours_extract * 1e3, 1),
        "extract_ms_reference_loop_torch_cpu":
            round(torch_extract * 1e3, 1) if torch_extract else None,
        "extract_speedup":
            round(torch_extract / ours_extract, 1) if torch_extract else None,
        "full_backtest_ms": round(ours_full * 1e3, 1),
        "n_trades": int((np.abs(res.trades) > 0).any(axis=1).sum()),
    }))


if __name__ == "__main__":
    main()
