"""Pallas window-gather kernel (ops/pallas_gather.py) vs the XLA path.

The kernel must reproduce the device sampler's gather EXACTLY (the
sampler's contract is bit-identical epochs to the numpy host collate),
including ragged source lengths, zero-masking past each window's
length, and the stacked x/u row layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.ops import pallas_gather as pg


def _mk(seed=0, n=7, C=5, U=4, T=48, lens=(60, 100, 96, 120, 48, 80, 111)):
    rng = np.random.default_rng(seed)
    xs = [rng.normal(size=(C, L)).astype(np.float32) for L in lens[:n]]
    us = [rng.normal(size=(U, L)).astype(np.float32) for L in lens[:n]]
    pool = jnp.asarray(pg.build_token_pool(xs, us, T))
    return xs, us, pool


def _ref_windows(seqs, si, st, ln, T):
    """Host reference: zero-padded windows, the collate contract."""
    out = []
    for i in range(len(si)):
        seq = seqs[si[i]]
        win = np.zeros((seq.shape[0], T), np.float32)
        L = ln[i]
        win[:, :L] = seq[:, st[i]:st[i] + L]
        out.append(win)
    return np.stack(out)


def _draw(rng, xs, B, T, min_len=12):
    min_len = min(min_len, T)
    si = rng.integers(0, len(xs), size=B).astype(np.int32)
    seq_len = np.array([xs[i].shape[1] for i in si], np.int64)
    hi = np.minimum(T, seq_len)
    ln = rng.integers(min_len, hi + 1).astype(np.int32)
    st = rng.integers(0, seq_len - ln + 1).astype(np.int32)
    return si, st, ln


@pytest.mark.parametrize("B,T", [(16, 48), (8, 32), (24, 128),
                                 (16, 8), (32, 104), (8, 256), (64, 40)])
def test_gather_tokens_exact(B, T):
    xs, us, pool = _mk(T=T)
    rng = np.random.default_rng(B)
    si, st, ln = _draw(rng, xs, B, T)
    xt, ut = pg.gather_tokens(pool, jnp.asarray(si), jnp.asarray(st),
                              jnp.asarray(ln), T, 5, 4, interpret=True)
    want_x = _ref_windows(xs, si, st, ln, T)          # (B, C, T)
    want_u = _ref_windows(us, si, st, ln, T)
    got_x = np.asarray(xt).reshape(5, B, T).transpose(1, 0, 2)
    got_u = np.asarray(ut).reshape(4, B, T).transpose(1, 0, 2)
    np.testing.assert_array_equal(got_x, want_x)
    np.testing.assert_array_equal(got_u, want_u)


def test_gather_window_lengths_equal_T_and_min():
    """Full-length windows (ln == T) and minimal windows both exact."""
    xs, us, pool = _mk()
    T = 48
    si = np.array([0, 1, 2, 3, 4, 5, 6, 0], np.int32)
    ln = np.array([T, T, 12, 12, T, 12, T, T], np.int32)
    st = np.array([0, 52, 0, 84, 0, 33, 63, 12], np.int32)
    xt, ut = pg.gather_tokens(pool, jnp.asarray(si), jnp.asarray(st),
                              jnp.asarray(ln), T, 5, 4, interpret=True)
    want = _ref_windows(xs, si, st, ln, T)
    got = np.asarray(xt).reshape(5, len(si), T).transpose(1, 0, 2)
    np.testing.assert_array_equal(got, want)
    assert np.asarray(ut).shape == (4, len(si) * T)


def test_gather_dma_variant_exact(monkeypatch):
    """Force the large-pool DMA path and require identical output."""
    xs, us, pool = _mk()
    T = 48
    rng = np.random.default_rng(7)
    si, st, ln = _draw(rng, xs, 16, T)
    args = (jnp.asarray(si), jnp.asarray(st), jnp.asarray(ln))
    a = pg.gather_tokens_raw(pool, *args, T, interpret=True)
    monkeypatch.setattr(pg, "_POOL_RESIDENT_MAX", 0)
    pg.gather_tokens_raw.clear_cache()
    b = pg.gather_tokens_raw(pool, *args, T, interpret=True)
    pg.gather_tokens_raw.clear_cache()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_supported_gate():
    xs, us, pool = _mk()
    assert pg.gather_supported(pool.shape, 16, 48)
    assert not pg.gather_supported(pool.shape, 16, 50)   # T % 8
    assert not pg.gather_supported(pool.shape, 3, 48)    # no window group
    # dtype gate: the kernel's loads/masks/scratch are f32
    assert not pg.gather_supported(pool.shape, 16, 48,
                                   dtype=jnp.bfloat16)
    # big B where the LARGEST legal group blows VMEM: the picker drops
    # to a smaller legal group that fits instead of rejecting outright
    assert pg.gather_supported((4, 512, 2048), 4096, 1024)
    assert pg._pick_bb(4096, 1024, (4, 512, 2048)) < 4096
    # genuinely impossible: even bb=1's out block exceeds the budget
    assert not pg.gather_supported((4, 65536, 2048), 4096, 1024)


def test_fused_tokens_path_matches_xu_path():
    """fused_loss_and_grads(tokens=...) must equal the (x, u) entry."""
    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.ops.pallas_train import fused_loss_and_grads

    xs, us, pool = _mk()
    T, B = 48, 8
    rng = np.random.default_rng(3)
    si, st, ln = _draw(rng, xs, B, T)
    xt, ut = pg.gather_tokens(pool, jnp.asarray(si), jnp.asarray(st),
                              jnp.asarray(ln), T, 5, 4, interpret=True)
    x = jnp.asarray(_ref_windows(xs, si, st, ln, T))
    u = jnp.asarray(_ref_windows(us, si, st, ln, T))
    lengths = jnp.asarray(ln)

    model = make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    params = model.init(jax.random.PRNGKey(0))
    l1, g1 = fused_loss_and_grads(model, params, x, u, lengths, 0.9,
                                  interpret=True)
    l2, g2 = fused_loss_and_grads(model, params, None, None, lengths, 0.9,
                                  interpret=True, tokens=(xt, ut))
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_sampler_token_path_cpu_fallback():
    """On CPU the sampler's epoch step must silently use the XLA gather
    (gate requires TPU) and still train."""
    from vqvaehmm_tpu import RandomChunkDataset, TrainState
    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.data.device_sampler import DeviceEpochSampler
    from vqvaehmm_tpu.train.trainer import make_optimizer

    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(5, 100)).astype(np.float32) for _ in range(4)]
    us = [rng.normal(size=(4, 100)).astype(np.float32) for _ in range(4)]
    ds = RandomChunkDataset(xs, us, min_len=16, max_len=48,
                            samples_per_epoch=64, seed=0)
    sampler = DeviceEpochSampler(ds)
    model = make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    gstep = sampler.make_epoch_step(model, tx, fused=True, donate=False)
    si, st, ln = sampler.sample_indices_fast(8, 4)
    state, loss = gstep(state, jnp.asarray(si), jnp.asarray(st),
                        jnp.asarray(ln), jnp.float32(1.0))
    assert np.isfinite(float(loss))


def test_device_sampler_token_path_mesh_matches_single_device():
    """Forced Pallas-gather token path under a data-parallel mesh must
    match the unsharded XLA-gather step (global psum'd normalizations +
    exact gather => same update up to fp reassociation)."""
    from vqvaehmm_tpu import RandomChunkDataset, TrainState, make_model
    from vqvaehmm_tpu.data.device_sampler import DeviceEpochSampler
    from vqvaehmm_tpu.parallel import create_mesh
    from vqvaehmm_tpu.train.trainer import make_optimizer

    rng = np.random.default_rng(1)
    xs = [rng.normal(size=(5, 100)).astype(np.float32) for _ in range(4)]
    us = [rng.normal(size=(4, 100)).astype(np.float32) for _ in range(4)]
    # T=64 -> bb0=2, so the B_local=2 per-shard batch passes the gather
    # gate; T=48 (bb0=8) would be rejected and the force would raise —
    # the gate no longer falls back silently, so an unsupported shape
    # here would make this parity test vacuous (review finding)
    ds = RandomChunkDataset(xs, us, min_len=16, max_len=64,
                            samples_per_epoch=64, seed=0)
    sampler = DeviceEpochSampler(ds)
    model = make_model(5, 32, 3, 16, u_dim=4, trans_hidden=32)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))

    si, st, ln = sampler.sample_indices_fast(16, 2)
    args = (jnp.asarray(si), jnp.asarray(st), jnp.asarray(ln),
            jnp.float32(0.9))

    ref_step = sampler.make_epoch_step(model, tx, fused=True, donate=False,
                                       use_pallas_gather=False)
    s_ref, l_ref = ref_step(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)),
        *args)

    mesh = create_mesh(8)
    pg_step = sampler.make_epoch_step(model, tx, fused=True, donate=False,
                                      mesh=mesh, use_pallas_gather=True)
    s_pg, l_pg = pg_step(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)),
        *args)

    np.testing.assert_allclose(float(l_ref), float(l_pg), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_pg.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
