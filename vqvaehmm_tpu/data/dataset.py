"""Host-side data pipeline: random chunk sampling + static-shape batching.

Reference semantics (VQ_VAE_HMM_fixed.py:10-29, 164-179): RandomChunkDataset
draws a random source sequence, a random chunk length in [min_len,
min(max_len, seq_len)] and a random start; collate_fn zero-pads the batch to
the batch max length and returns (x, u, lengths).

TPU-native differences (SURVEY.md section 7 "Variable-length batching"):

* Sampling runs in numpy on the host; batches are materialized as numpy
  arrays and transferred once per step (or once per epoch for the scan
  trainer) — no per-item tensor creation on device like the reference's
  device-pinned collate (VQ_VAE_HMM_fixed.py:172-173).
* Batches are padded to a *fixed* length (max_len, or the smallest bucket
  >= the batch max when `length_buckets` is set) instead of the batch max,
  so XLA compiles one (or a handful of) shapes instead of one per batch.
  Because every ELBO term is masked and every normalizer depends only on
  `lengths` (VQ_VAE_HMM_fixed.py:120,131,135), padding farther than the
  batch max provably does not change the loss — see
  tests/test_elbo_parity.py::test_padding_invariance.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class RandomChunkDataset:
    """Random variable-length chunks from a pool of (C, T_i) sequences.

    API-compatible with the reference class (VQ_VAE_HMM_fixed.py:10-29):
    len() == samples_per_epoch (reference hardcodes 1000), __getitem__
    ignores idx and samples randomly.
    """

    def __init__(self, x_sequences, u_sequences, min_len: int = 20,
                 max_len: int = 200, samples_per_epoch: int = 1000,
                 seed: Optional[int] = None):
        # contiguity required by the native sampler (native/fastdata.c)
        self.x_seqs = [np.ascontiguousarray(x, dtype=np.float32)
                       for x in x_sequences]
        self.u_seqs = [np.ascontiguousarray(u, dtype=np.float32)
                       for u in u_sequences]
        if len(self.x_seqs) != len(self.u_seqs):
            raise ValueError("x_sequences and u_sequences must align")
        # validate UP FRONT what the native sampler validates
        # (native/fastdata.c:88,111-114,140,150): the numpy path would
        # otherwise fail nondeterministically mid-epoch (an RNG draw that
        # happens to hit a short sequence raises an opaque 'low >= high')
        # or silently train on misaligned x/u slices.
        if not self.x_seqs:
            raise ValueError("sequence pool is empty")
        if min_len > max_len:
            raise ValueError(f"min_len={min_len} > max_len={max_len}")
        for i, (xs, us) in enumerate(zip(self.x_seqs, self.u_seqs)):
            if xs.shape[1] != us.shape[1]:
                raise ValueError(
                    f"sequence {i}: x/u time dims must match "
                    f"({xs.shape[1]} vs {us.shape[1]})")
            if xs.shape[1] < min_len:
                raise ValueError(
                    f"sequence {i} is shorter than min_len "
                    f"({xs.shape[1]} < {min_len})")
        self.min_len = min_len
        self.max_len = max_len
        self.samples_per_epoch = samples_per_epoch
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.samples_per_epoch

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, int]:
        seq_idx = int(self.rng.integers(0, len(self.x_seqs)))
        x_seq = self.x_seqs[seq_idx]
        u_seq = self.u_seqs[seq_idx]
        seq_len = x_seq.shape[1]
        hi = min(self.max_len, seq_len)
        chunk_len = int(self.rng.integers(self.min_len, hi + 1))
        start = int(self.rng.integers(0, seq_len - chunk_len + 1))
        return (x_seq[:, start:start + chunk_len],
                u_seq[:, start:start + chunk_len], chunk_len)


def pick_bucket(batch_max: int, buckets: Sequence[int],
                max_len: int) -> int:
    """Smallest bucket >= batch_max, else max_len; capped at max_len —
    chunks never exceed max_len, so a wider bucket would only compile an
    extra shape and over-allocate past the documented ceiling."""
    for b in sorted(buckets):
        if b >= batch_max:
            return min(b, max_len)
    return max_len


def collate_fn(batch: List[Tuple[np.ndarray, np.ndarray, int]],
               pad_to: Optional[int] = None):
    """Zero-pad a list of (x:(C,L), u:(U,L), L) to (B,C,T),(B,U,T),(B,).

    With pad_to=None this matches the reference collate exactly (pad to the
    batch max, VQ_VAE_HMM_fixed.py:164-179) but returns host numpy arrays
    instead of device-pinned tensors.  Pass pad_to for static-shape batches.
    """
    lengths = np.array([item[2] for item in batch], dtype=np.int32)
    if pad_to is not None and pad_to < int(lengths.max()):
        raise ValueError(
            f"pad_to ({pad_to}) < batch max length ({int(lengths.max())})"
            " — padding must not truncate")
    T = int(pad_to) if pad_to is not None else int(lengths.max())
    B = len(batch)
    C = batch[0][0].shape[0]
    U = batch[0][1].shape[0]
    x = np.zeros((B, C, T), dtype=np.float32)
    u = np.zeros((B, U, T), dtype=np.float32)
    for i, (xi, ui, L) in enumerate(batch):
        x[i, :, :L] = xi
        u[i, :, :L] = ui
    return x, u, lengths


def batch_iterator(dataset: RandomChunkDataset, batch_size: int,
                   length_buckets: Sequence[int] = (),
                   drop_last: bool = True
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield statically-shaped (x, u, lengths) batches for one epoch."""
    n = len(dataset)
    items: List[Tuple[np.ndarray, np.ndarray, int]] = []
    for i in range(n):
        items.append(dataset[i])
        if len(items) == batch_size:
            yield _pad_batch(items, dataset.max_len, length_buckets)
            items = []
    if items and not drop_last:
        yield _pad_batch(items, dataset.max_len, length_buckets)


def _pad_batch(items, max_len, buckets):
    batch_max = max(it[2] for it in items)
    pad_to = pick_bucket(batch_max, buckets, max_len) if buckets else max_len
    return collate_fn(items, pad_to=pad_to)


try:
    from .. import _fastdata  # native batch assembly (native/fastdata.c)
except ImportError:  # pure-Python fallback; build with `setup.py build_ext`
    _fastdata = None


def epoch_arrays(dataset: RandomChunkDataset, batch_size: int,
                 num_batches: Optional[int] = None,
                 use_native: Optional[bool] = None):
    """Materialize a whole epoch as stacked arrays for the scan trainer.

    Returns (x:(N,B,C,T), u:(N,B,U,T), lengths:(N,B)) padded to max_len so a
    single jitted lax.scan consumes the epoch without host round-trips.

    When the native extension is built (native/fastdata.c), sampling +
    padded assembly run in C with the GIL released — the sampling stream
    differs from the numpy path but has the same distribution; pass
    use_native=False for the numpy stream.
    """
    if num_batches is None:
        num_batches = len(dataset) // batch_size
    if num_batches <= 0:
        raise ValueError(
            f"no batches: batch_size={batch_size} > samples_per_epoch="
            f"{len(dataset)} (the scan trainer would train on nothing)")
    if use_native and _fastdata is None:
        raise ImportError(
            "use_native=True but the native extension is not built "
            "(python setup.py build_ext --inplace); its sample stream "
            "differs from the numpy path, so a silent fallback would "
            "change the training trajectory")
    if use_native is None:
        use_native = _fastdata is not None
    if use_native and _fastdata is not None:
        seed = int(dataset.rng.integers(0, 2 ** 63 - 1))
        return _fastdata.sample_epoch(
            dataset.x_seqs, dataset.u_seqs, num_batches, batch_size,
            dataset.min_len, dataset.max_len, dataset.max_len, seed)
    xs, us, ls = [], [], []
    for _ in range(num_batches):
        items = [dataset[i] for i in range(batch_size)]
        x, u, l = collate_fn(items, pad_to=dataset.max_len)
        xs.append(x)
        us.append(u)
        ls.append(l)
    return np.stack(xs), np.stack(us), np.stack(ls)


def epoch_skip(dataset: RandomChunkDataset, batch_size: int,
               num_batches: Optional[int] = None,
               use_native: Optional[bool] = None) -> None:
    """Consume exactly the rng draws one epoch_arrays call makes, without
    assembling the arrays.

    Used to fast-forward the stateful sample stream when training resumes
    from epoch N (train/pipeline.py): replaying N epochs through
    epoch_arrays would assemble and discard every padded batch, which at
    recipe scale costs minutes of host time; this consumes the same
    draws in microseconds.  Must stay in lockstep with epoch_arrays'
    draw pattern (pinned by tests/test_data.py::test_epoch_skip_*)."""
    if num_batches is None:
        num_batches = len(dataset) // batch_size
    if use_native and _fastdata is None:
        # same guard as epoch_arrays: the native and numpy streams
        # differ, so a silent fallback would change the trajectory
        raise ImportError(
            "use_native=True but the native extension is not built "
            "(python setup.py build_ext --inplace)")
    if use_native is None:
        use_native = _fastdata is not None
    if use_native:
        dataset.rng.integers(0, 2 ** 63 - 1)  # the per-epoch C seed draw
        return
    for _ in range(num_batches):
        for i in range(batch_size):
            dataset[i]  # per-item draws; slicing cost only, no padding
