"""Native batch-assembly extension (_fastdata) vs the numpy path."""

import numpy as np
import pytest

from vqvaehmm_tpu.data import RandomChunkDataset, epoch_arrays
from vqvaehmm_tpu.data.dataset import _fastdata
from vqvaehmm_tpu.data.synthetic import synthetic_sequences

pytestmark = pytest.mark.skipif(_fastdata is None,
                                reason="native extension not built (run: python setup.py "
                                       "build_ext --inplace)")


def _ds(seed=0):
    xs, us, _ = synthetic_sequences(5, 150, 5, 4, 3, seed=seed)
    return RandomChunkDataset(xs, us, min_len=20, max_len=64,
                              samples_per_epoch=64, seed=seed)


def test_native_epoch_shapes_and_bounds():
    ds = _ds()
    x, u, lens = epoch_arrays(ds, 8, use_native=True)
    assert x.shape == (8, 8, 5, 64)
    assert u.shape == (8, 8, 4, 64)
    assert lens.shape == (8, 8)
    assert x.dtype == np.float32 and lens.dtype == np.int32
    assert (lens >= 20).all() and (lens <= 64).all()
    # padding is zeroed beyond each row's length
    for b in range(8):
        for i in range(8):
            L = lens[b, i]
            assert (x[b, i, :, L:] == 0).all()
            assert (u[b, i, :, L:] == 0).all()


def test_native_chunks_are_real_slices():
    """Every sampled chunk must be an exact contiguous slice of some
    source sequence."""
    ds = _ds(seed=1)
    x, u, lens = epoch_arrays(ds, 4, num_batches=2, use_native=True)
    for b in range(2):
        for i in range(4):
            L = int(lens[b, i])
            chunk = x[b, i, :, :L]
            found = False
            for src in ds.x_seqs:
                T = src.shape[1]
                for s in range(T - L + 1):
                    if np.array_equal(src[:, s:s + L], chunk):
                        found = True
                        break
                if found:
                    break
            assert found, "chunk is not a slice of any source sequence"


def test_native_deterministic_given_seed():
    ds1 = _ds(seed=7)
    ds2 = _ds(seed=7)
    a = epoch_arrays(ds1, 8, use_native=True)
    b = epoch_arrays(ds2, 8, use_native=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_native_rejects_bad_inputs():
    with pytest.raises((TypeError, ValueError)):
        _fastdata.sample_epoch([np.zeros((5, 10), np.float64)],
                               [np.zeros((4, 10), np.float32)],
                               1, 2, 5, 8, 8, 0)
    with pytest.raises(ValueError):
        _fastdata.sample_epoch([np.zeros((5, 10), np.float32)],
                               [np.zeros((4, 10), np.float32)],
                               1, 2, 9, 8, 8, 0)  # min_len > max_len


def test_native_faster_than_numpy():
    """The point of the extension: epoch assembly should beat the
    interpreter loop comfortably."""
    import time

    xs, us, _ = synthetic_sequences(8, 400, 5, 4, 3, seed=2)
    ds = RandomChunkDataset(xs, us, min_len=50, max_len=200,
                            samples_per_epoch=1000, seed=0)
    t0 = time.perf_counter()
    epoch_arrays(ds, 64, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    epoch_arrays(ds, 64, use_native=False)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
