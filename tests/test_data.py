"""Data pipeline: chunk sampling bounds, collate semantics (vs the
reference's collate_fn, VQ_VAE_HMM_fixed.py:164-179), bucketing, epoch
stacking, checkpoint round-trips, torch-interop mapping."""

import numpy as np
import pytest

from vqvaehmm_tpu.data import (RandomChunkDataset, batch_iterator,
                               collate_fn, epoch_arrays, load_params_npz,
                               pick_bucket, save_params_npz)
from vqvaehmm_tpu.data.synthetic import synthetic_sequences


def _ds(**kw):
    xs, us, _ = synthetic_sequences(4, 120, 5, 4, 3, seed=0)
    return RandomChunkDataset(xs, us, **kw)


def test_collate_reference_semantics():
    """Pad to batch max, zeros beyond each row's length, int lengths."""
    items = [(np.ones((5, 10), np.float32), np.ones((4, 10), np.float32), 10),
             (np.ones((5, 7), np.float32) * 2, np.ones((4, 7), np.float32), 7)]
    x, u, lengths = collate_fn(items)
    assert x.shape == (2, 5, 10) and u.shape == (2, 4, 10)
    np.testing.assert_array_equal(lengths, [10, 7])
    assert (x[1, :, 7:] == 0).all()
    assert (x[1, :, :7] == 2).all()


def test_collate_pad_to_fixed():
    items = [(np.ones((5, 10), np.float32), np.ones((4, 10), np.float32), 10)]
    x, u, lengths = collate_fn(items, pad_to=32)
    assert x.shape == (1, 5, 32)
    assert (x[0, :, 10:] == 0).all()


def test_pick_bucket():
    assert pick_bucket(30, (32, 64, 128), 200) == 32
    assert pick_bucket(33, (32, 64, 128), 200) == 64
    assert pick_bucket(150, (32, 64, 128), 200) == 200


def test_batch_iterator_bucketed_shapes():
    ds = _ds(min_len=20, max_len=100, samples_per_epoch=48, seed=1)
    shapes = set()
    for x, u, lengths in batch_iterator(ds, 16, length_buckets=(32, 64)):
        shapes.add(x.shape[2])
        assert (lengths <= x.shape[2]).all()
    assert shapes <= {32, 64, 100}


def test_epoch_arrays_shapes():
    ds = _ds(min_len=20, max_len=64, samples_per_epoch=32, seed=2)
    xs, us, lens = epoch_arrays(ds, 8)
    assert xs.shape == (4, 8, 5, 64)
    assert us.shape == (4, 8, 4, 64)
    assert lens.shape == (4, 8)
    assert (lens >= 20).all() and (lens <= 64).all()


def test_dataset_len_default_1000():
    ds = _ds()
    assert len(ds) == 1000  # reference hardcodes 1000 (:17-18)


def test_params_npz_roundtrip(tmp_path):
    params = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
              "b": np.ones(4, np.float32)}
    p = str(tmp_path / "p.npz")
    save_params_npz(p, params)
    loaded = load_params_npz(p)
    np.testing.assert_array_equal(loaded["a"]["w"], params["a"]["w"])
    np.testing.assert_array_equal(loaded["b"], params["b"])


def test_torch_interop_mapping():
    """Round-trip our pytree through reference state_dict naming."""
    import jax

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.utils import (vae_hmm_params_from_state_dict,
                                    vae_hmm_params_to_state_dict)

    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    sd = vae_hmm_params_to_state_dict(params)
    assert "encoder.conv1.weight" in sd
    assert sd["encoder.conv1.weight"].shape == (8, 5, 3)  # torch OIW
    assert sd["prior.transition_net.0.weight"].shape == (8, 2)
    back = vae_hmm_params_from_state_dict(sd)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_interop_rejects_bad_keys():
    from vqvaehmm_tpu.utils import vae_hmm_params_from_state_dict

    with pytest.raises(KeyError):
        vae_hmm_params_from_state_dict({"encoder.conv1.weight":
                                        np.zeros((8, 5, 3))})


def test_torch_state_dict_numeric_parity():
    """Params loaded from an actual torch state_dict produce the same
    encode outputs as the source arrays."""
    import jax
    import jax.numpy as jnp
    import torch

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.utils import (state_dict_to_numpy,
                                    vae_hmm_params_from_state_dict)

    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(3))
    from vqvaehmm_tpu.utils import vae_hmm_params_to_state_dict

    sd_np = vae_hmm_params_to_state_dict(params)
    # simulate a real torch state_dict
    sd_torch = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    back = vae_hmm_params_from_state_dict(state_dict_to_numpy(sd_torch))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 12))
                    .astype(np.float32))
    np.testing.assert_allclose(np.asarray(model.encode(params, x)),
                               np.asarray(model.encode(back, x)), atol=1e-7)


def test_save_torch_file_roundtrip(tmp_path):
    """Models trained here export to a reference-loadable .pt: save via
    torch.save, reload through load_torch_file, identical pytrees."""
    import jax

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.utils.torch_interop import (
        load_torch_file, save_torch_file, vae_hmm_params_from_state_dict)

    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(7))
    path = str(tmp_path / "exported.pt")
    save_torch_file(params, path)
    back = vae_hmm_params_from_state_dict(load_torch_file(path))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_sampler_matches_host_path():
    """DeviceEpochSampler must reproduce the numpy host path bit-for-bit:
    same seed -> same index stream -> identical padded epoch tensors
    (the on-device gather is a drop-in replacement for host assembly)."""
    import jax

    from vqvaehmm_tpu.data import (DeviceEpochSampler, RandomChunkDataset,
                                   epoch_arrays)
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences

    # variable-length sources exercise the per-sequence bounds
    xs, us, _ = synthetic_sequences(4, 90, 5, 4, 3, seed=3)
    xs = [x[:, :T] for x, T in zip(xs, (90, 70, 55, 83))]
    us = [u[:, :T] for u, T in zip(us, (90, 70, 55, 83))]

    ds_host = RandomChunkDataset(xs, us, min_len=10, max_len=40,
                                 samples_per_epoch=32, seed=7)
    ds_dev = RandomChunkDataset(xs, us, min_len=10, max_len=40,
                                samples_per_epoch=32, seed=7)

    x_h, u_h, l_h = epoch_arrays(ds_host, 8, use_native=False)
    sampler = DeviceEpochSampler(ds_dev)
    x_d, u_d, l_d = sampler.epoch(8)

    np.testing.assert_array_equal(l_h, np.asarray(l_d))
    np.testing.assert_array_equal(x_h, np.asarray(x_d))
    np.testing.assert_array_equal(u_h, np.asarray(u_d))

    # a second epoch advances the stream identically on both paths
    x_h2, _, l_h2 = epoch_arrays(ds_host, 8, use_native=False)
    x_d2, _, l_d2 = sampler.epoch(8)
    np.testing.assert_array_equal(l_h2, np.asarray(l_d2))
    np.testing.assert_array_equal(x_h2, np.asarray(x_d2))


def test_gather_fused_epoch_step_matches_two_call():
    """The gather-in-scan epoch trainer must produce the same update as
    gathering the epoch first and running the standard epoch scan."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import TrainState, make_epoch_step, make_model
    from vqvaehmm_tpu.data import DeviceEpochSampler, RandomChunkDataset
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.train.trainer import make_optimizer

    xs, us, _ = synthetic_sequences(4, 60, 5, 4, 3, seed=1)
    ds = RandomChunkDataset(xs, us, min_len=8, max_len=24,
                            samples_per_epoch=16, seed=5)
    sampler = DeviceEpochSampler(ds)
    si, st, ln = sampler.sample_indices_fast(8, num_batches=2)

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))

    # path A: gather the epoch, then the standard epoch scan
    x, u, l = sampler._gather(sampler.xsrc, sampler.usrc,
                              jnp.asarray(si), jnp.asarray(st),
                              jnp.asarray(ln))
    sA = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    stepA = make_epoch_step(model, tx, donate=False)
    sA, lossA = stepA(sA, x, u, l, jnp.float32(1.0))

    # path B: gather fused into the training scan
    sB = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    stepB = sampler.make_epoch_step(model, tx, donate=False)
    sB, lossB = stepB(sB, jnp.asarray(si), jnp.asarray(st),
                      jnp.asarray(ln), jnp.float32(1.0))

    assert abs(float(lossA) - float(lossB)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_gather_fused_epoch_step_mesh_matches_single_device():
    """The gather-in-scan trainer under a data-parallel mesh (index
    arrays sharded on their batch dim) must match the single-device run."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import TrainState, make_model
    from vqvaehmm_tpu.data import DeviceEpochSampler, RandomChunkDataset
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.parallel import create_mesh
    from vqvaehmm_tpu.train.trainer import make_optimizer

    xs, us, _ = synthetic_sequences(4, 60, 5, 4, 3, seed=1)
    ds = RandomChunkDataset(xs, us, min_len=8, max_len=24,
                            samples_per_epoch=32, seed=9)
    sampler = DeviceEpochSampler(ds)
    si, st, ln = sampler.sample_indices_fast(16, num_batches=2)

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))

    sA = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    stepA = sampler.make_epoch_step(model, tx, donate=False)
    sA, lossA = stepA(sA, jnp.asarray(si), jnp.asarray(st),
                      jnp.asarray(ln), jnp.float32(1.0))

    mesh = create_mesh(8)
    sB = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    stepB = sampler.make_epoch_step(model, tx, donate=False, mesh=mesh)
    sB, lossB = stepB(sB, jnp.asarray(si), jnp.asarray(st),
                      jnp.asarray(ln), jnp.float32(1.0))

    assert abs(float(lossA) - float(lossB)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_device_sampler_dense_pools_are_lazy():
    """The dense (N,C,Tpad)/(N,U,Tpad) pools are a second full-dataset
    layout used only by the XLA dynamic-slice gather; constructing the
    sampler or taking the Pallas token path must not build them (the
    fused token path would otherwise pay host assembly + an upload for
    bytes it never reads)."""
    from vqvaehmm_tpu.data import DeviceEpochSampler, RandomChunkDataset
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences

    xs, us, _ = synthetic_sequences(4, 60, 5, 4, 3, seed=2)
    ds = RandomChunkDataset(xs, us, min_len=8, max_len=24,
                            samples_per_epoch=32, seed=0)
    sampler = DeviceEpochSampler(ds)
    assert not hasattr(sampler, "_dense"), "pools built in __init__"

    sampler.token_pool()  # the fused-path layout
    assert not hasattr(sampler, "_dense"), "token path built dense pools"

    # first touch of the XLA-gather path builds them, once
    x_d, u_d, l_d = sampler.epoch(8)
    assert hasattr(sampler, "_dense")
    assert x_d.shape == (4, 8, 5, 24) and u_d.shape == (4, 8, 4, 24)
    first = sampler.dense_pools()
    assert sampler.dense_pools()[0] is first[0]  # cached, not rebuilt


def test_dataset_validates_like_native_sampler():
    """Construction-time validation matching native/fastdata.c: short
    sequences, x/u time mismatch, min>max, and empty pools fail
    immediately — the numpy path previously crashed nondeterministically
    mid-epoch (whenever the RNG drew the bad sequence)."""
    import pytest

    from vqvaehmm_tpu.data import RandomChunkDataset

    rng = np.random.default_rng(0)
    ok_x = [rng.normal(size=(5, 50)).astype(np.float32)]
    ok_u = [rng.normal(size=(4, 50)).astype(np.float32)]

    with pytest.raises(ValueError, match="shorter than min_len"):
        RandomChunkDataset([rng.normal(size=(5, 15)).astype(np.float32)],
                           [rng.normal(size=(4, 15)).astype(np.float32)],
                           min_len=20, max_len=48)
    with pytest.raises(ValueError, match="time dims must match"):
        RandomChunkDataset(ok_x,
                           [rng.normal(size=(4, 40)).astype(np.float32)],
                           min_len=10, max_len=48)
    with pytest.raises(ValueError, match="min_len"):
        RandomChunkDataset(ok_x, ok_u, min_len=60, max_len=48)
    with pytest.raises(ValueError, match="empty"):
        RandomChunkDataset([], [], min_len=10, max_len=48)


def test_epoch_arrays_guards():
    """Zero batches raise a clear error; explicit use_native=True raises
    when the extension is unavailable instead of silently changing the
    sample stream; oversized buckets are capped at max_len; pad_to
    cannot truncate."""
    import pytest

    from vqvaehmm_tpu.data import RandomChunkDataset, epoch_arrays
    from vqvaehmm_tpu.data.dataset import (_fastdata, collate_fn,
                                           pick_bucket)

    rng = np.random.default_rng(1)
    ds = RandomChunkDataset(
        [rng.normal(size=(5, 60)).astype(np.float32)],
        [rng.normal(size=(4, 60)).astype(np.float32)],
        min_len=8, max_len=24, samples_per_epoch=8, seed=0)

    with pytest.raises(ValueError, match="no batches"):
        epoch_arrays(ds, batch_size=16)

    if _fastdata is None:
        with pytest.raises(ImportError, match="native extension"):
            epoch_arrays(ds, batch_size=4, use_native=True)

    assert pick_bucket(20, (32, 256), max_len=24) == 24  # capped
    assert pick_bucket(20, (32, 256), max_len=64) == 32

    items = [ds[i] for i in range(4)]
    bad = max(it[2] for it in items) - 1
    with pytest.raises(ValueError, match="truncate"):
        collate_fn(items, pad_to=bad)


@pytest.mark.parametrize("use_native", [False, None])
def test_epoch_skip_matches_epoch_arrays_stream(use_native):
    """epoch_skip consumes EXACTLY the rng draws epoch_arrays makes: a
    dataset skipped over epoch 0 produces epoch 1 identical to a dataset
    that materialized epoch 0.  use_native=None exercises the native C
    stream when the extension is built (its per-epoch draw is one seed
    integer), False pins the numpy per-item stream."""
    from vqvaehmm_tpu.data.dataset import epoch_arrays, epoch_skip

    xs, us, _ = synthetic_sequences(4, 120, 5, 4, 3, seed=0)

    def make():
        return RandomChunkDataset(xs, us, min_len=16, max_len=48,
                                  samples_per_epoch=32, seed=7)

    ds_full, ds_skip = make(), make()
    epoch_arrays(ds_full, 8, use_native=use_native)
    epoch_skip(ds_skip, 8, use_native=use_native)
    a = epoch_arrays(ds_full, 8, use_native=use_native)
    b = epoch_arrays(ds_skip, 8, use_native=use_native)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_epoch_skip_native_guard(monkeypatch):
    """epoch_skip(use_native=True) without the extension must raise like
    epoch_arrays does — a silent numpy fallback would consume a
    different rng stream than the epochs it claims to replay."""
    import vqvaehmm_tpu.data.dataset as dsmod

    xs, us, _ = synthetic_sequences(2, 60, 5, 4, 3, seed=0)
    ds = RandomChunkDataset(xs, us, min_len=16, max_len=32,
                            samples_per_epoch=8, seed=0)
    monkeypatch.setattr(dsmod, "_fastdata", None)
    with pytest.raises(ImportError, match="native extension"):
        dsmod.epoch_skip(ds, 4, use_native=True)
