"""Headline benchmark: VAE-HMM ELBO training throughput (seqs/sec/chip).

Config: the reference README recipe — VAE_HMM(input_dim=5, hidden_dim=64,
K=3, hidden_dim2=32, u_dim=4), B=64, T=200 (reference README.md:117-124,
configs/config.yaml:3-17).

vs_baseline: ratio against a CPU-PyTorch implementation of the reference
train step (the reference publishes no numbers — BASELINE.md — so the
anchor is measured in-process with functional torch ops implementing
VQ_VAE_HMM_fixed.py's exact forward+loss+Adam step).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the benchmark's kernels can take minutes
# to compile through a remote-compile relay; caching makes repeat runs
# (and the driver's round-end run) start from warm executables.  Must be
# set before jax initializes its backends.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

B, C, T, K, U = 64, 5, 200, 3, 4
HIDDEN, HIDDEN2, TRANS_HIDDEN = 64, 32, 128
LR = 1e-3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, C, T)).astype(np.float32)
    u = rng.normal(size=(B, U, T)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    lengths[0] = T
    return x, u, lengths


def bench_jax() -> "tuple[float, float, float]":
    """Times the real training path (epoch-fused lax.scan, as used by
    train_model), synced by a host fetch of the final loss so async
    dispatch cannot under-report.  Returns (median, min, max) seqs/sec
    over 5 independent windows."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import TrainState, make_model
    from vqvaehmm_tpu.train.trainer import make_epoch_step, make_optimizer

    # Fast training config: default matmul precision (bf16 MXU passes, the
    # standard TPU training practice; converges equivalently — see
    # BENCH_NOTES.md).  Parity/validation runs use matmul_precision=
    # "highest" + the precise transcendental kernels instead.
    model = make_model(C, HIDDEN, K, HIDDEN2, u_dim=U,
                       trans_hidden=TRANS_HIDDEN,
                       matmul_precision="default",
                       compute_dtype="bfloat16")
    tx = make_optimizer(LR)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    # fused=True: loss + all parameter grads in one VMEM-resident Pallas
    # kernel (ops/pallas_train.py) — ~2.3x the XLA step's marginal rate
    # (grads match jax.grad; tests/test_pallas_train.py).
    epoch_step = make_epoch_step(model, tx, donate=True, fused=True)

    steps_per_call = 3200
    x, u, lengths = make_batch()
    # materialize the stacked epoch on device (broadcast, not host-stack)
    tile = jax.jit(lambda a: jnp.broadcast_to(
        a[None], (steps_per_call,) + a.shape) + jnp.zeros((), a.dtype))
    xs, us, lns = tile(jnp.asarray(x)), tile(jnp.asarray(u)), \
        tile(jnp.asarray(lengths))
    beta = jnp.float32(1.0)

    state, loss = epoch_step(state, xs, us, lns, beta)  # compile
    float(loss)

    # 5 independent windows with [min, max] spread, same policy as the
    # latency metrics: the headline is the MEDIAN, and any published
    # claim must sit inside the recorded spread (round-2 VERDICT item 3;
    # chip-load through the shared tunnel swings single windows ~3-10%).
    trials = 5
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        state, loss = epoch_step(state, xs, us, lns, beta)
        float(loss)  # host fetch = true sync
        times.append(time.perf_counter() - t0)
    rates = sorted(steps_per_call * B / t for t in times)
    sps = rates[len(rates) // 2]
    lo, hi = rates[0], rates[-1]
    log(f"jax: {steps_per_call} steps, median {sps:.1f} seqs/s "
        f"[{lo:.1f}, {hi:.1f}] over {trials} windows "
        f"({jax.devices()[0].platform})")
    return sps, lo, hi


def bench_viterbi_p50() -> float:
    """Viterbi decode p50 latency (us/batch) at the benchmark shape
    (B=64, T=200, K=3, time-varying input-conditioned transitions).

    BASELINE.json's second metric half.  No reference implementation
    exists (the reference hard-decodes via argmax — reference
    backtesting.py:155), so this measurement IS the baseline.  End-to-end
    decode (prior MLP + encoder evidence + Viterbi); viterbi_decode
    auto-dispatches to the fused doubling-scan Pallas kernel on TPU
    (BENCH_NOTES.md round-2 table)."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model

    from vqvaehmm_tpu.utils.benchmarking import saturated_marginal

    model = make_model(C, HIDDEN, K, HIDDEN2, u_dim=U,
                       trans_hidden=TRANS_HIDDEN)
    params = model.init(jax.random.PRNGKey(0))
    xb, ub, lb = make_batch()
    x, u = jnp.asarray(xb), jnp.asarray(ub)
    lengths = jnp.asarray(lb)

    # Saturated repeat-in-call marginal (index-perturbed inputs so XLA
    # cannot CSE the iterations; R sized so BOTH points spend far longer
    # on device than the ~26 ms transport window).  The earlier stacked
    # two-point variant used a fixed M calibrated for ~250 us decodes;
    # once the decode got 3-10x faster that M sat inside the transport
    # overlap and under-reported (BENCH_NOTES.md "measurement
    # methodology").
    def make(R):
        @jax.jit
        def f():
            def body(c, i):
                s = model.viterbi_decode(
                    params, x + (i * 1e-7).astype(jnp.float32), u, lengths)
                return c + jnp.sum(s), None
            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(R, dtype=jnp.int32))
            return tot
        return f

    from vqvaehmm_tpu.utils.benchmarking import saturated_marginal_windows

    p50, lo, hi, _ = saturated_marginal_windows(make, est_us=60.0,
                                                floor_ms=60.0)
    log(f"viterbi: p50 {p50:.1f} us/batch marginal "
        f"[{lo:.1f}, {hi:.1f}] over 5 windows (B={B}, T={T}, K={K})")
    return p50, lo, hi


def bench_serving_forward() -> float:
    """Serving forward goodput (seqs/sec/chip) at B=64, T=200 through the
    real serving path (VAEHMM.infer_forward -> fused kernel on TPU,
    ops/pallas_infer.py) at the default matmul_precision="highest"
    (matches the XLA forward to ~1e-7).  Saturated repeat-in-call
    marginal (index-perturbed; both points >> the transport window)."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model

    model = make_model(C, HIDDEN, K, HIDDEN2, u_dim=U,
                       trans_hidden=TRANS_HIDDEN)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    vt = jnp.asarray(T, jnp.int32)

    from vqvaehmm_tpu.utils.benchmarking import saturated_marginal

    def make(R):
        @jax.jit
        def f():
            def body(c, i):
                mu, _, q = model.infer_forward(
                    params, x + (i * 1e-7).astype(jnp.float32), valid_to=vt)
                return c + jnp.sum(q[:, 0, -1]) + jnp.sum(mu[:, 0, -1]), None
            tot, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jnp.arange(R, dtype=jnp.int32))
            return tot
        return f

    from vqvaehmm_tpu.utils.benchmarking import saturated_marginal_windows

    us, lo_us, hi_us, _ = saturated_marginal_windows(make, est_us=100.0)
    sps = B / us * 1e6
    lo_sps, hi_sps = B / hi_us * 1e6, B / lo_us * 1e6
    log(f"serving forward: {us:.1f} us/fwd at B={B} -> {sps:.0f} seqs/s "
        f"[{lo_sps:.0f}, {hi_sps:.0f}] over 5 windows")
    return sps, lo_sps, hi_sps


def bench_end_to_end() -> dict:
    """Training goodput INCLUDING the input pipeline (round-2 VERDICT
    item 2): the device-resident headline says nothing about whether the
    1-core host can feed it.  Two feeding strategies are measured over
    full epochs at the benchmark config:

    * host path: native C sampler (native/fastdata.c) + double-buffered
      prefetch (data/prefetch.py) assembling epochs in host RAM and
      shipping them — the reference's DataLoader pattern done as fast as
      this host allows;
    * device sampler (data/device_sampler.py): the host draws only index
      triples; chunk gather + padding run on-chip from a resident source
      pool — the TPU-native design that removes the host from the loop.
    """
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import RandomChunkDataset, TrainState, make_model
    from vqvaehmm_tpu.data.device_sampler import DeviceEpochSampler
    from vqvaehmm_tpu.data.prefetch import prefetch_epochs
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.train.trainer import make_epoch_step, make_optimizer

    model = make_model(C, HIDDEN, K, HIDDEN2, u_dim=U,
                       trans_hidden=TRANS_HIDDEN,
                       matmul_precision="default",
                       compute_dtype="bfloat16")
    tx = make_optimizer(LR)
    params = model.init(jax.random.PRNGKey(0))
    epoch_step = make_epoch_step(model, tx, donate=True, fused=True)

    xs, us, _ = synthetic_sequences(16, 2 * T, C, U, K, seed=0)

    def run_epochs(feed, n_epochs, state):
        t0 = time.perf_counter()
        n_seqs = 0
        for xb, ub, lb in feed(n_epochs):
            state, loss = epoch_step(state, jnp.asarray(xb),
                                     jnp.asarray(ub), jnp.asarray(lb),
                                     jnp.float32(1.0))
            n_seqs += int(np.prod(lb.shape))
        float(loss)  # sync
        return n_seqs / (time.perf_counter() - t0), state

    # Epoch sizes differ per path: the host path is measured small (it
    # runs at a few thousand seqs/s on this 1-core host — 50 batches
    # already costs ~30s of wall clock); the device paths use epochs big
    # enough to amortize the per-dispatch tunnel round-trip the same way
    # the device-resident headline's 3200-step scan does.
    n_batches, warm, timed = 50, 2, 6
    n_batches_dev = 800

    # host path (native sampler + prefetch)
    ds = RandomChunkDataset(xs, us, min_len=T // 2, max_len=T,
                            samples_per_epoch=n_batches * B, seed=0)

    def host_feed(n):
        return prefetch_epochs(ds, B, n, num_batches=n_batches)

    # fresh buffer copies per path: epoch_step donates its state, and two
    # TrainStates sharing params leaves would leave path 2 reading
    # donated (deleted) buffers
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState(p1, tx.init(p1), jnp.zeros((), jnp.int32))
    _, state = run_epochs(host_feed, warm, state)  # compile + warm cache
    host_sps, state = run_epochs(host_feed, timed, state)

    # device-sampler path
    ds2 = RandomChunkDataset(xs, us, min_len=T // 2, max_len=T,
                             samples_per_epoch=n_batches_dev * B, seed=0)
    sampler = DeviceEpochSampler(ds2)

    def dev_feed(n):
        for _ in range(n):
            yield sampler.epoch(B, num_batches=n_batches_dev,
                                exact_stream=False)

    p2 = jax.tree_util.tree_map(jnp.copy, params)
    state2 = TrainState(p2, tx.init(p2), jnp.zeros((), jnp.int32))
    _, state2 = run_epochs(dev_feed, warm, state2)
    dev_sps, _ = run_epochs(dev_feed, timed, state2)

    # gather fused INTO the training scan: one dispatch per epoch, host
    # ships only (batches, B) int32 index triples
    ds3 = RandomChunkDataset(xs, us, min_len=T // 2, max_len=T,
                             samples_per_epoch=n_batches_dev * B, seed=0)
    sampler3 = DeviceEpochSampler(ds3)
    gstep = sampler3.make_epoch_step(model, tx, fused=True, donate=True)
    p3 = jax.tree_util.tree_map(jnp.copy, params)
    state3 = TrainState(p3, tx.init(p3), jnp.zeros((), jnp.int32))

    def run_gathered(n_epochs, state):
        t0 = time.perf_counter()
        n_seqs = 0
        for _ in range(n_epochs):
            si, st_, ln = sampler3.sample_indices_fast(B, n_batches_dev)
            state, loss = gstep(state, jnp.asarray(si), jnp.asarray(st_),
                                jnp.asarray(ln), jnp.float32(1.0))
            n_seqs += si.size
        float(loss)
        return n_seqs / (time.perf_counter() - t0), state

    _, state3 = run_gathered(warm, state3)
    gath_sps, _ = run_gathered(timed, state3)

    log(f"end-to-end train: host-fed {host_sps:.0f} seqs/s "
        f"({n_batches} batches/epoch), "
        f"device-sampler {dev_sps:.0f} seqs/s, "
        f"gather-in-scan {gath_sps:.0f} seqs/s "
        f"({n_batches_dev} batches/epoch; B={B}, T={T})")
    return {"host_fed": host_sps, "device_sampler": dev_sps,
            "gather_in_scan": gath_sps}


def bench_pipeline_default() -> "tuple[float, float, float]":
    """Training goodput through TrainPipeline itself at the zero-knob
    input defaults (round-3 VERDICT item 1): input_pipeline and fused
    both resolve from 'auto' — on TPU that selects the device input
    pipeline (gather-in-scan) + the fused Pallas step, so a user running
    the documented pipeline gets the measured-fast path with no knobs.

    Methodology: log_fn timestamps WITHIN one call (the steady-state
    recipe CLAUDE.md blesses).  Every pipeline.train() call re-traces
    its fresh closures (~10 s of host work through the compile relay,
    with multi-second run-to-run variance), so cross-call matched
    subtraction needs an impractically large signal: the first on-chip
    runs of this bench measured delta <= 0 at a 0.7 s signal and a
    -0.8 s trial at a 4 s signal.  Instead ONE measured call runs
    num_epochs big epochs with a timestamp-recording log_fn; per-epoch
    wall = compute + the one float(loss) fetch the pipeline does when
    logging is on (exactly what a user with logging enabled sees).
    n_batches is sized so that sync is ~3% of the epoch (~1.1 s compute
    vs ~30-50 ms RTT), and the rate is the median per-epoch diff after
    dropping the first (which absorbs dispatch ramp), spread = [min,
    max] over the steady diffs.  A rate can therefore not exceed the
    device-resident ceiling by construction (each diff is a full
    synced epoch).
    """
    import tempfile

    from vqvaehmm_tpu.core.config import (Config, DataConfig, ModelConfig,
                                          TrainConfig)
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    n_batches = 12800     # ~1.1 s of compute per epoch at the headline
    n_epochs = 8          # 7 steady per-epoch diffs after the first
    xs, us, _ = synthetic_sequences(16, 2 * T, C, U, K, seed=0)
    with tempfile.TemporaryDirectory() as td:
        np.save(os.path.join(td, "x.npy"), xs)
        np.save(os.path.join(td, "u.npy"), us)

        def run(num_epochs, tag, log_fn=None):
            cfg = Config(
                # same throughput model config as the headline (bf16 +
                # default matmul precision); the knobs under test — the
                # INPUT selection — stay at their 'auto' defaults
                model=ModelConfig(input_dim=C, hidden_dim=HIDDEN, K=K,
                                  hidden_dim2=HIDDEN2, u_dim=U,
                                  trans_hidden=TRANS_HIDDEN,
                                  matmul_precision="default",
                                  compute_dtype="bfloat16"),
                data=DataConfig(min_len=T // 2, max_len=T,
                                samples_per_epoch=n_batches * B,
                                x_sequences_path=os.path.join(td, "x.npy"),
                                u_sequences_path=os.path.join(td, "u.npy")),
                training=TrainConfig(batch_size=B, num_epochs=num_epochs,
                                     learning_rate=LR, save_freq=0,
                                     seed=0,
                                     checkpoint_dir=os.path.join(td, tag)))
            TrainPipeline(cfg).train(log_fn=log_fn, resume=False)

        run(1, "warm")            # compile; warm the persistent cache
        stamps = []
        run(n_epochs, "timed",
            log_fn=lambda msg: stamps.append(time.perf_counter())
            if msg.startswith("Epoch") else None)
    # one stamp per "Epoch k" log line, taken right after the pipeline's
    # float(loss) sync; diffs between consecutive stamps are full synced
    # epochs.  Drop the first diff (dispatch ramp out of the trace).
    diffs = np.diff(np.asarray(stamps))[1:]
    if diffs.size == 0 or np.any(diffs <= 0):
        log("pipeline default: degenerate epoch timestamps, reporting 0")
        return 0.0, 0.0, 0.0
    rates = n_batches * B / diffs
    sps = float(np.median(rates))
    lo, hi = float(rates.min()), float(rates.max())
    log(f"pipeline default: {sps:.0f} seqs/s through TrainPipeline "
        f"[{lo:.0f}, {hi:.0f}] (log_fn-timestamped, {len(diffs)} steady "
        f"epochs of {n_batches} batches; B={B}, T={T})")
    return sps, lo, hi


def bench_torch_cpu() -> float:
    """Functional-torch reference train step (forward + backward + Adam)."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    dev = "cpu"

    def conv_p(i, o, k):
        fan = i * k
        b = 1.0 / math.sqrt(fan)
        return (torch.empty(o, i, k).uniform_(-b, b).requires_grad_(),
                torch.empty(o).uniform_(-b, b).requires_grad_())

    def lin_p(i, o):
        b = 1.0 / math.sqrt(i)
        return (torch.empty(o, i).uniform_(-b, b).requires_grad_(),
                torch.empty(o).uniform_(-b, b).requires_grad_())

    e1w, e1b = conv_p(C, HIDDEN, 3)
    e2w, e2b = conv_p(HIDDEN, HIDDEN2, 3)
    elw, elb = conv_p(HIDDEN2, K, 1)
    log_prior = torch.zeros(K, requires_grad=True)
    p1w, p1b = lin_p(U, TRANS_HIDDEN)
    p2w, p2b = lin_p(TRANS_HIDDEN, K * K)
    emb = torch.randn(K, HIDDEN, requires_grad=True)
    d1w, d1b = conv_p(HIDDEN, HIDDEN, 3)
    d2w, d2b = conv_p(HIDDEN, HIDDEN, 3)
    dpw, dpb = conv_p(HIDDEN, C * 2, 1)
    params = [e1w, e1b, e2w, e2b, elw, elb, log_prior, p1w, p1b, p2w, p2b,
              emb, d1w, d1b, d2w, d2b, dpw, dpb]
    opt = torch.optim.Adam(params, lr=LR)

    xb, ub, lb = make_batch()
    x = torch.from_numpy(xb)
    u = torch.from_numpy(ub)
    lengths = torch.from_numpy(lb.astype(np.int64))

    def loss_fn():
        mask = torch.arange(T)[None, :] < lengths[:, None]
        ut = u.permute(0, 2, 1).reshape(B * T, U)
        h = F.relu(F.linear(ut, p1w, p1b))
        log_A = F.log_softmax(F.linear(h, p2w, p2b).view(B, T, K, K), dim=-1)
        log_pi = F.log_softmax(log_prior, dim=-1)
        h = F.relu(F.conv1d(x, e1w, e1b, padding=1))
        h = F.relu(F.conv1d(h, e2w, e2b, padding=1))
        logits = F.conv1d(h, elw, elb)
        q = F.softmax(logits, dim=1)
        e = torch.matmul(q.permute(0, 2, 1), emb).permute(0, 2, 1)
        h = F.relu(F.conv1d(e, d1w, d1b, padding=1))
        h = F.relu(F.conv1d(h, d2w, d2b, padding=1))
        out = F.conv1d(h, dpw, dpb)
        mu, logvar = out[:, :C], out[:, C:]
        var = logvar.exp().clamp(min=1e-8)
        nll = 0.5 * (torch.log(2 * math.pi * var) + (mu - x) ** 2 / var)
        recon = (nll * mask.unsqueeze(1).float()).sum() / \
            (mask.sum() * C).clamp(min=1.0)
        init_t = (q[:, :, 0] * log_pi.unsqueeze(0)).sum(1)
        qp = q[:, :, :-1].permute(0, 2, 1).unsqueeze(-1)
        qn = q[:, :, 1:].permute(0, 2, 1).unsqueeze(-2)
        trans = (qp * qn * log_A[:, 1:]).sum(dim=(2, 3))
        tm = (mask[:, 1:] & mask[:, :-1]).float()
        prior_l = -(init_t + (trans * tm).sum(1)).mean()
        ent = -(q * F.log_softmax(logits, dim=1)).sum(1)
        ent = (ent * mask.float()).sum() / B
        return recon + (prior_l - ent)

    def step():
        opt.zero_grad()
        loss = loss_fn()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(3):
        step()  # warmup (first step pays lazy init; two more to settle)
    # best of 7 windows within one process: the 1-core host's transient
    # load has been seen to swing a single window by ~4x
    iters = 10
    best_dt = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        for _ in range(iters):
            step()
        best_dt = min(best_dt, time.perf_counter() - t0)
    sps = iters * B / best_dt
    log(f"torch-cpu: best {iters}-step window {best_dt:.3f}s "
        f"-> {sps:.1f} seqs/s")
    return sps


def measure_torch_anchor():
    """Stabilized torch-CPU anchor: the MEDIAN of 5 process-fresh runs,
    each reporting its best-of-7 10-step window (bench_torch_cpu).

    A single in-process measurement swung vs_baseline 664x <-> 898x
    between rounds (~40% anchor variance — allocator state, transient
    host load).  Fresh processes decorrelate allocator/cache state; the
    median rejects loaded runs.  Methodology pinned per round-3 VERDICT
    item 7; two consecutive bench runs must agree on the anchor within
    ~10% (measured 2026-08-19: consecutive medians within ~5%)."""
    import subprocess

    rates = []
    me = os.path.abspath(__file__)
    for i in range(5):
        try:
            out = subprocess.run(
                [sys.executable, me, "--torch-anchor"],
                capture_output=True, text=True, timeout=600)
            line = out.stdout.strip().splitlines()[-1]
            rates.append(float(json.loads(line)["torch_sps"]))
        except Exception as e:  # noqa: BLE001 — anchor, not a dependency
            log(f"torch anchor subprocess {i} failed: {e!r}")
    if not rates:
        log("all anchor subprocesses failed; measuring in-process")
        return bench_torch_cpu()
    rates.sort()
    med = rates[len(rates) // 2]
    log(f"torch-cpu anchor: median of {len(rates)} process-fresh runs "
        f"{[round(r, 1) for r in rates]} -> {med:.1f} seqs/s")
    return med


def _require_backend(timeout_s: float = None):
    """Fail fast if the accelerator tunnel never comes up.

    Backend init through the remote relay blocks indefinitely when the
    tunnel is down (observed: jax.devices() parked in a retry sleep for
    20+ minutes); the driver's round-end bench run would hang with no
    diagnostic.  Probe init in a daemon thread with a deadline and exit
    2 with a clear message instead."""
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", 300))
    done = threading.Event()
    info = {}

    def probe():
        try:
            import jax

            info["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, then exit
            info["error"] = e
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        log(f"backend init did not complete within {timeout_s:.0f}s — "
            "accelerator tunnel unreachable; aborting instead of hanging")
        os._exit(2)  # the probe thread is stuck in C; sys.exit can't run
    if "error" in info:
        log(f"backend init failed: {info['error']!r}")
        os._exit(2)
    log(f"backend up: {info['devices']}")


def main():
    if "--torch-anchor" in sys.argv:
        # subprocess mode (measure_torch_anchor): torch only, no jax —
        # prints one JSON line and exits
        print(json.dumps({"torch_sps": bench_torch_cpu()}))
        return
    _require_backend()
    jax_sps, jax_lo, jax_hi = bench_jax()
    try:
        vit_p50, vit_lo, vit_hi = bench_viterbi_p50()
    except Exception as e:  # secondary metric; never sink the headline
        log(f"viterbi bench failed: {e}")
        vit_p50 = vit_lo = vit_hi = None
    try:
        serve_sps, serve_lo, serve_hi = bench_serving_forward()
    except Exception as e:  # secondary metric; never sink the headline
        log(f"serving forward bench failed: {e}")
        serve_sps = serve_lo = serve_hi = None
    try:
        e2e = bench_end_to_end()
    except Exception as e:  # secondary metric; never sink the headline
        log(f"end-to-end bench failed: {e}")
        e2e = {}
    try:
        pipe_sps, pipe_lo, pipe_hi = bench_pipeline_default()
    except Exception as e:  # secondary metric; never sink the headline
        log(f"pipeline-default bench failed: {e}")
        pipe_sps = pipe_lo = pipe_hi = None
    try:
        torch_sps = measure_torch_anchor()
    except Exception as e:  # torch baseline is an anchor, not a dependency
        log(f"torch baseline failed: {e}")
        torch_sps = None
    vs = jax_sps / torch_sps if torch_sps else None
    print(json.dumps({
        "metric": "vae_hmm_elbo_train_seqs_per_sec_per_chip",
        "value": round(jax_sps, 2),
        "unit": "seqs/sec",
        "train_spread_seqs_per_sec": [round(jax_lo, 2), round(jax_hi, 2)],
        "vs_baseline": round(vs, 2) if vs else None,
        # the anchor that produced vs_baseline, recorded alongside it so
        # the multiplier is always interpretable across rounds: the
        # r03->r04 jump 664x->1009x was an anchor-METHODOLOGY change
        # (best-window -> median of 5 process-fresh runs), not a speedup
        # (round-4 VERDICT item 7; BENCH_NOTES "anchor methodology")
        "torch_cpu_anchor_seqs_per_sec":
            round(torch_sps, 1) if torch_sps else None,
        # Second half of BASELINE.json's metric: Viterbi decode p50.  The
        # reference has no Viterbi (argmax decode, backtesting.py:155), so
        # this number IS the baseline being established.  _spread fields
        # are [min, max] over 5 independent measurement windows — any
        # published claim must sit inside them (round-2 VERDICT item 3).
        "viterbi_decode_p50_us_per_batch":
            round(vit_p50, 1) if vit_p50 is not None else None,
        "viterbi_decode_spread_us":
            [round(vit_lo, 1), round(vit_hi, 1)]
            if vit_lo is not None else None,
        "viterbi_shape": f"B={B},T={T},K={K}",
        # serving forward through the fused kernel (ops/pallas_infer.py),
        # default full-f32 precision — the production /infer hot path
        "serving_forward_seqs_per_sec_per_chip":
            round(serve_sps) if serve_sps is not None else None,
        "serving_forward_spread":
            [round(serve_lo), round(serve_hi)]
            if serve_lo is not None else None,
        # training goodput including the input pipeline (host-fed C
        # sampler + prefetch vs on-device index-gather assembly)
        "train_seqs_per_sec_end_to_end_host_fed":
            round(e2e["host_fed"]) if e2e else None,
        "train_seqs_per_sec_end_to_end_device_sampler":
            round(e2e["device_sampler"]) if e2e else None,
        "train_seqs_per_sec_end_to_end_gather_in_scan":
            round(e2e["gather_in_scan"]) if e2e else None,
        # goodput through the default-config TrainPipeline itself (the
        # 'auto' input_pipeline/fused selection, round-3 VERDICT item 1)
        "train_seqs_per_sec_pipeline_default":
            round(pipe_sps) if pipe_sps is not None else None,
        "train_seqs_per_sec_pipeline_default_spread":
            [round(pipe_lo), round(pipe_hi)]
            if pipe_lo is not None else None,
    }))


if __name__ == "__main__":
    main()
