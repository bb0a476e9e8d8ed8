"""Pallas window-gather: (seq, start, length) index triples -> token-major
training inputs, entirely on-chip.

The device input pipeline (data/device_sampler.py) assembles each batch
by slicing random windows out of a resident source pool.  The XLA
lowering of that gather (vmap'd dynamic_slice) costs as much as the
fused train step itself at the benchmark shape (~84 us vs ~85 us per
step, BENCH_NOTES "Pallas gather"): each per-window dynamic slice
becomes an individually-issued load.  This kernel does the same work at
~43 us by loading an ALIGNED wide window per sample (Mosaic requires
dynamic lane offsets provably divisible by 128) and rotating it into
place in-register with `pltpu.roll`, writing the fused train kernel's
own token layout (C, B*T) directly — the per-step (B, C, T) transpose
disappears too.

Layout contract
---------------
The pool stacks x on top of u per sequence: (N, CUP, TPAD) f32 with
rows [0, C) = x channels, [C, C+U) = u channels, rows [C+U, CUP) zero
padding to a sublane multiple (DMA slices need 8-aligned sublane
extents).  TPAD is sized so every aligned wide load stays in bounds.
The kernel emits (CUP, B*T); callers slice rows [:C] and [C:C+U].

Two load strategies, auto-selected by pool size:

* pool fits VMEM: the whole pool is a resident input block; per-window
  aligned vector loads.
* large pool: the pool stays in HBM (`memory_space=ANY`); per-window
  async DMA copies into a scratch buffer, issued in a batch then
  drained (measured within ~8% of the resident path).

Dynamic-roll caveat: Mosaic mis-lowers NEGATIVE dynamic rotate amounts
(off by one 128-lane block, measured on this toolchain); the kernel
always passes the equivalent non-negative amount (TW - r) % TW.

No reference analog: the reference feeds training from a host-side
torch DataLoader (VQ_VAE_HMM_fixed.py:164-179).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# the gather runs under the raised sequential-grid scoped-VMEM limit
# (same rationale as the fused train kernel, BENCH_NOTES "Raised
# scoped-VMEM limit")
_VMEM_LIMIT = 64 * 1024 * 1024
_POOL_RESIDENT_MAX = 32 * 1024 * 1024   # past this, the DMA variant


def _wide(T: int) -> int:
    """Aligned wide-window lanes: covers T plus a worst-case 127-lane
    residue shift."""
    return ((T - 1) // _LANES + 2) * _LANES


def pool_pad_t(max_start: int, T: int) -> int:
    """Time padding so src[si, :, q : q + TW] is in bounds for every
    aligned q <= max_start."""
    return (max_start // _LANES + 1) * _LANES + _wide(T)


def build_token_pool(x_seqs, u_seqs, T: int) -> np.ndarray:
    """(N, CUP, TPAD) f32 pool: x rows, u rows, zero sublane padding."""
    n = len(x_seqs)
    C = x_seqs[0].shape[0]
    U = u_seqs[0].shape[0]
    cup = -(-(C + U) // 8) * 8
    max_len = max(int(x.shape[1]) for x in x_seqs)
    tpad = pool_pad_t(max_len, T)
    pool = np.zeros((n, cup, tpad), np.float32)
    for i, (xs, us) in enumerate(zip(x_seqs, u_seqs)):
        L = xs.shape[1]
        pool[i, :C, :L] = xs
        pool[i, C:C + U, :L] = us
    return pool


def _vmem_ok(pool_shape: Tuple[int, int, int], bb: int, T: int) -> bool:
    """Out block + resident pool (or DMA scratch) within the VMEM budget."""
    n, cup, tpad = pool_shape
    pool_bytes = n * cup * tpad * 4
    out_block = cup * bb * T * 4
    if pool_bytes <= _POOL_RESIDENT_MAX:
        return out_block + pool_bytes <= _VMEM_LIMIT - 8 * 1024 * 1024
    scratch = bb * cup * _wide(T) * 4
    return out_block + scratch <= _VMEM_LIMIT - 8 * 1024 * 1024


def _pick_bb(B: int, T: int,
             pool_shape: Optional[Tuple[int, int, int]] = None) -> int:
    """Largest window-group size with (bb*T) % 128 == 0 dividing B; with
    pool_shape, the largest such size that ALSO fits the VMEM budget
    (unconditionally taking the largest would reject big-B shapes a
    smaller legal group handles fine — same fitting pattern as
    pallas_train._pick_block_b)."""
    bb0 = _LANES // math.gcd(T, _LANES)
    for k in range(B // bb0, 0, -1):
        bb = k * bb0
        if B % bb:
            continue
        if pool_shape is not None and not _vmem_ok(pool_shape, bb, T):
            continue
        return bb
    return 0


def gather_supported(pool_shape: Tuple[int, int, int], B: int,
                     T: int, dtype=jnp.float32) -> bool:
    """Dispatch gate: backend handled by the caller; this bounds dtype
    (the kernel's loads/masks/scratch are f32), lane tiling, window
    grouping, AND VMEM (out block + scratch/pool)."""
    if dtype != jnp.float32:
        return False
    if T % 8 != 0:
        return False
    return _pick_bb(B, T, pool_shape) != 0


def _epilogue(idx_ref, out_ref, load, w, b, T, TW):
    s_t = idx_ref[1, b]
    q = (s_t // _LANES) * _LANES
    r = s_t - q
    wide = load(q)
    rolled = pltpu.roll(wide, (TW - r) % TW, axis=1)
    mask = (lax.broadcasted_iota(jnp.int32, (1, T), 1) < idx_ref[2, b])
    out_ref[:, w * T:(w + 1) * T] = rolled[:, :T] * mask.astype(jnp.float32)


def _kernel_resident(idx_ref, src_ref, out_ref, *, BB: int, T: int,
                     TW: int):
    g = pl.program_id(0)
    for w in range(BB):
        b = g * BB + w
        _epilogue(idx_ref, out_ref,
                  lambda q: src_ref[idx_ref[0, b], :, pl.ds(q, TW)],
                  w, b, T, TW)


def _kernel_dma(idx_ref, src_ref, out_ref, scratch, sem, *, BB: int,
                T: int, TW: int):
    g = pl.program_id(0)

    def copy(w):
        b = g * BB + w
        q = (idx_ref[1, b] // _LANES) * _LANES
        return pltpu.make_async_copy(
            src_ref.at[idx_ref[0, b], :, pl.ds(q, TW)], scratch.at[w], sem)

    for w in range(BB):
        copy(w).start()
    for w in range(BB):
        copy(w).wait()
    for w in range(BB):
        _epilogue(idx_ref, out_ref, lambda q: scratch[w], w, g * BB + w,
                  T, TW)


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def gather_tokens_raw(pool: jnp.ndarray, si: jnp.ndarray, st: jnp.ndarray,
                      ln: jnp.ndarray, T: int,
                      interpret: bool = False) -> jnp.ndarray:
    """(CUP, B*T) token block for one batch of index triples (B,) each.
    Windows are zero-masked past their length, matching the host collate.
    Caller must have checked `gather_supported`."""
    n, cup, tpad = pool.shape
    B = si.shape[0]
    BB = _pick_bb(B, T, pool.shape)
    if BB == 0 or pool.dtype != jnp.float32:
        raise ValueError(
            f"window gather unsupported at B={B}, T={T}, "
            f"pool {pool.shape}/{pool.dtype} (see gather_supported); "
            "use the XLA gather path")
    TW = _wide(T)
    idx = jnp.stack([si, st, ln]).astype(jnp.int32)
    resident = n * cup * tpad * 4 <= _POOL_RESIDENT_MAX
    cp = (None if interpret else
          pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    if resident:
        return pl.pallas_call(
            functools.partial(_kernel_resident, BB=BB, T=T, TW=TW),
            grid=(B // BB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((n, cup, tpad), lambda g: (0, 0, 0))],
            out_specs=pl.BlockSpec((cup, BB * T), lambda g: (0, g)),
            out_shape=jax.ShapeDtypeStruct((cup, B * T), jnp.float32),
            interpret=interpret,
            compiler_params=cp,
        )(idx, pool)
    return pl.pallas_call(
        functools.partial(_kernel_dma, BB=BB, T=T, TW=TW),
        grid=(B // BB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((cup, BB * T), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((cup, B * T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BB, cup, TW), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=cp,
    )(idx, pool)


def gather_tokens(pool: jnp.ndarray, si: jnp.ndarray, st: jnp.ndarray,
                  ln: jnp.ndarray, T: int, C: int, U: int,
                  interpret: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(xt:(C, B*T), ut:(U, B*T)) — the fused train kernel's `tokens=`
    layout (ops/pallas_train.py fused_loss_and_grads)."""
    tok = gather_tokens_raw(pool, si, st, ln, T, interpret=interpret)
    return tok[:C], tok[C:C + U]
