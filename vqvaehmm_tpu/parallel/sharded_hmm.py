"""Sequence-parallel HMM forward: the time axis sharded over the mesh.

SURVEY.md section 5 notes the associative-scan formulation makes
T-sharding trivial; this module does it for real with shard_map:

1. each device runs a local `lax.associative_scan` over its T-shard of the
   (K, K) log-matmul operators;
2. the per-shard TOTAL operators (one (K, K) matrix each) are all-gathered
   — K*K*n_shards numbers, negligible ICI traffic;
3. each device computes the exclusive log-matmul prefix of the gathered
   totals and applies it to its local prefixes, recovering exactly the
   global forward recursion.

Use for year-long single sequences in backtests (T in the 10^4-10^5 range)
where one device's VMEM/HBM or latency budget is the limit.  Results match
ops/hmm.forward to numerical precision (tested on the virtual 8-device
mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.hmm import ForwardResult, _as_time_varying, _log_matmul
from ..ops.precise import plogsumexp


@functools.lru_cache(maxsize=None)
def _make_forward(mesh: Mesh, axis: str):
    """One jitted executable per (mesh, axis), cached: rebuilding the
    jit per call would re-trace and re-enter the compile relay every
    time (the retrace trap the project notes document), and building
    the operator tensor eagerly outside jit would pay one ~26 ms tunnel
    dispatch per primitive."""

    def shard_fn(ops_local, alpha0_full):
        # ops_local: (B, T/n, K, K) — this shard's operators
        K = ops_local.shape[-1]
        eye = jnp.where(jnp.eye(K, dtype=bool), 0.0, -jnp.inf)
        local_prefix = lax.associative_scan(_log_matmul, ops_local, axis=1)
        total = local_prefix[:, -1]  # (B, K, K) product of this shard
        # gather every shard's total: (n, B, K, K)
        totals = lax.all_gather(total, axis)
        idx = lax.axis_index(axis)

        # exclusive prefix of totals across shards (n is tiny: unrolled
        # scan over the gathered axis)
        def combine(carry, t):
            return _log_matmul(carry, t), carry

        eye_b = jnp.broadcast_to(eye, total.shape)
        _, exclusive = lax.scan(combine, eye_b, totals)
        prefix_in = jnp.take(exclusive, idx, axis=0)  # (B, K, K)

        # global prefix for local positions, then apply alpha0 row
        global_prefix = _log_matmul(prefix_in[:, None], local_prefix)
        alpha_local = plogsumexp(
            alpha0_full[:, None, :, None] + global_prefix, axis=2)
        return alpha_local  # (B, T/n, K)

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis), P(None)),
        out_specs=P(None, axis),
        # check_vma stays OFF deliberately: the varying-analysis
        # rejects the lax.scan over the all_gathered totals (its
        # carry is replicated while take(axis_index) makes the
        # output device-varying — a legal pattern the checker can't
        # type; enabling it fails 4 tests with scan TypeErrors)
        check_vma=False,
    )

    @jax.jit
    def run(log_A, log_obs, log_pi):
        B, T, K = log_obs.shape
        # operators M_t = log_A_t + obs broadcast; index 0's operator is
        # unused (alpha_0 is the initial row) -> identity.  Built INSIDE
        # the jitted program: one compiled pipeline, no eager dispatches,
        # and GSPMD keeps the big tensor on the sharded layout.
        ops = log_A + log_obs[:, :, None, :]
        eye = jnp.where(jnp.eye(K, dtype=bool), 0.0, -jnp.inf)
        ops = ops.at[:, 0].set(jnp.broadcast_to(eye, (B, K, K)))
        alpha0 = log_pi[None, :] + log_obs[:, 0]  # (B, K)
        log_alpha = smapped(ops, alpha0)
        # position 0's operator was identity, so alpha[0] == alpha0
        ll = plogsumexp(log_alpha[:, -1], axis=-1)
        return log_alpha, ll

    return run


def forward_sharded(log_pi: jnp.ndarray, log_A: jnp.ndarray,
                    log_obs: jnp.ndarray, mesh: Mesh,
                    axis: str = "data") -> ForwardResult:
    """Forward pass with T sharded over `axis` of the mesh.

    log_A: (B, T, K, K) (or broadcastable), log_obs: (B, T, K); T must be
    divisible by the mesh axis size.  No `lengths` support here — padded
    decoding stays on the unsharded path (ragged masking is cheap there).
    """
    B, T, K = log_obs.shape
    log_A = _as_time_varying(log_A, B, T)
    n = mesh.shape[axis]
    if T % n != 0:
        raise ValueError(f"T={T} must divide over {n} shards")
    log_alpha, ll = _make_forward(mesh, axis)(log_A, log_obs, log_pi)
    return ForwardResult(log_alpha, ll)
