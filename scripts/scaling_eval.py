"""Weak-scaling measurement of the mesh data-parallel epoch step.

Runs on an 8-virtual-device CPU mesh (the harness's multi-chip stand-in:
xla_force_host_platform_device_count) with the per-device batch FIXED at
the benchmark's 64 sequences and the global batch growing with the mesh.
All virtual devices share one physical core, so ideal weak scaling here is
step time growing LINEARLY with device count; the reported overhead
  t_n / (n * t_1) - 1
isolates what the partitioner/collectives add on top of the compute.
On real ICI-connected chips the same program shape gives constant step
time with the gradient psum riding ICI.

Usage: python scripts/scaling_eval.py   (self-pins JAX_PLATFORMS=cpu)
"""

from __future__ import annotations

import os

# persistent compile cache (CLAUDE.md: remote compiles cost minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cache_tests" if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache_bench")
import sys

if __name__ == "__main__" and os.environ.get("_SCALING_CHILD") != "1":
    # re-exec with the virtual device count pinned before jax loads;
    # strip any ambient interposer that would override JAX_PLATFORMS via
    # jax.config and silently run "the mesh" on one remote TPU (see
    # tests/conftest.py — same defense)
    env = dict(os.environ)
    env["_SCALING_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    for k in [k for k in env if k.startswith(("PALLAS_AXON", "AXON_"))]:
        del env[k]
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import time  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import TrainState, make_model
    from vqvaehmm_tpu.parallel import create_mesh
    from vqvaehmm_tpu.train.trainer import make_epoch_step, make_optimizer

    PER_DEV_B, T, S = 64, 96, 2
    model = make_model(5, 64, 3, 32, u_dim=4, trans_hidden=128)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    rows = []
    t1 = None
    for n in (1, 2, 4, 8):
        B = PER_DEV_B * n
        xs = jnp.asarray(rng.normal(size=(S, B, 5, T)).astype(np.float32))
        us = jnp.asarray(rng.normal(size=(S, B, 4, T)).astype(np.float32))
        lens = jnp.asarray(
            rng.integers(T // 2, T + 1, size=(S, B)).astype(np.int32))
        mesh = create_mesh(n)
        step = make_epoch_step(model, tx, mesh=mesh, donate=False)
        st = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        st, loss = step(st, xs, us, lens, jnp.float32(1.0))
        float(loss)  # compile + sync
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            st, loss = step(st, xs, us, lens, jnp.float32(1.0))
            float(loss)
            times.append((time.perf_counter() - t0) / S)
        t = float(np.median(times))
        if t1 is None:
            t1 = t
        overhead = t / (n * t1) - 1.0
        rows.append((n, B, t * 1e3, overhead))
        print(f"n={n} global_B={B:4d} step={t * 1e3:8.2f} ms "
              f"overhead_vs_linear={overhead * 100:+6.1f}%", flush=True)

    worst = max(r[3] for r in rows)
    print(f"worst collective/partitioner overhead: {worst * 100:+.1f}% "
          f"(bounded: {'yes' if worst < 0.25 else 'NO'})")

    # bulk inference sharded over the mesh (serving scale-out;
    # infer_forward(mesh=...) — no collectives, so overhead isolates pure
    # shard_map partitioning cost)
    print("\nbulk inference (per-device B fixed at 64):", flush=True)
    t1 = None
    for n in (1, 2, 4, 8):
        B = PER_DEV_B * n
        x = jnp.asarray(rng.normal(size=(B, 5, T)).astype(np.float32))
        lens = jnp.asarray(rng.integers(T // 2, T + 1, size=B)
                           .astype(np.int32))
        mesh = create_mesh(n)
        fwd = jax.jit(lambda p, xx, ll, m=mesh: model.infer_forward(
            p, xx, valid_to=ll, mesh=m))
        mu, _, q = fwd(params, x, lens)
        q.block_until_ready()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            mu, _, q = fwd(params, x, lens)
            q.block_until_ready()
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        if t1 is None:
            t1 = t
        overhead = t / (n * t1) - 1.0
        print(f"n={n} global_B={B:4d} fwd={t * 1e3:8.2f} ms "
              f"overhead_vs_linear={overhead * 100:+6.1f}%", flush=True)


if __name__ == "__main__":
    main()
