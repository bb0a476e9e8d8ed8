"""Fused train-step kernel (ops/pallas_train.py) vs jax autodiff.

The kernel hand-derives the whole backward pass, so the load-bearing test
is exact agreement of every parameter gradient with
jax.value_and_grad(model.compute_loss) — same masking (variable lengths,
valid_to), same three loss normalizations, beta != 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import TrainState, make_model
from vqvaehmm_tpu.ops.pallas_train import fused_loss_and_grads
from vqvaehmm_tpu.train.trainer import make_optimizer, make_train_step


def _setup(B=16, C=5, T=48, U=4, seed=0, **model_kw):
    model = make_model(C, 64, 3, 32, u_dim=U, trans_hidden=128, **model_kw)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, U, T)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=B)
                          .astype(np.int32))
    lengths = lengths.at[0].set(T)
    return model, params, x, u, lengths


@pytest.mark.parametrize("beta", [1.0, 0.7])
def test_fused_grads_match_autodiff(beta):
    model, params, x, u, lengths = _setup()
    ref_loss, ref_grads = jax.value_and_grad(model.compute_loss)(
        params, x, u, lengths, beta)
    loss, grads = fused_loss_and_grads(model, params, x, u, lengths, beta,
                                       interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-5)
    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(grads)[0]}
    assert set(flat) == set(flat_ref)
    for ks, ref in flat_ref.items():
        a, b = np.asarray(ref), np.asarray(flat[ks])
        assert a.shape == b.shape, ks
        # per-leaf relative-to-leaf-max tolerance (gradients span decades)
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=5e-5 * max(np.max(np.abs(a)), 1e-12),
            err_msg=ks)


def test_fused_grads_short_lengths_and_layout():
    """All-short lengths (valid_to < T) and the (B, T, U) u layout."""
    model, params, x, u, lengths = _setup(seed=3)
    lengths = jnp.minimum(lengths, 37)  # valid_to strictly inside T
    u_btu = jnp.transpose(u, (0, 2, 1))
    ref_loss, ref_grads = jax.value_and_grad(model.compute_loss)(
        params, x, u_btu, lengths, 1.0)
    loss, grads = fused_loss_and_grads(model, params, x, u_btu, lengths,
                                       1.0, interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-5)
    for ref, got in zip(jax.tree_util.tree_leaves(ref_grads),
                        jax.tree_util.tree_leaves(grads)):
        a, b = np.asarray(ref), np.asarray(got)
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=5e-5 * max(np.max(np.abs(a)), 1e-12))


def test_fused_train_step_trains():
    """make_train_step(fused=True) produces the same trajectory as the XLA
    step (CPU: both paths compute with exact f32 matmuls)."""
    model, params, x, u, lengths = _setup(seed=1)
    tx = make_optimizer(1e-3)
    s_f = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s_x = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_f = make_train_step(model, tx, donate=False, fused=True)
    step_x = make_train_step(model, tx, donate=False)
    losses_f, losses_x = [], []
    for _ in range(5):
        s_f, lf = step_f(s_f, x, u, lengths, jnp.float32(1.0))
        s_x, lx = step_x(s_x, x, u, lengths, jnp.float32(1.0))
        losses_f.append(float(lf))
        losses_x.append(float(lx))
    np.testing.assert_allclose(losses_f, losses_x, rtol=2e-3)
    assert losses_f[-1] < losses_f[0]


def test_fused_rejects_unsupported():
    model, params, x, u, lengths = _setup(T=50)  # T % 8 != 0
    with pytest.raises(ValueError):
        fused_loss_and_grads(model, params, x, u, lengths, 1.0,
                             interpret=True)


def test_fused_mesh_step_matches_single_device():
    """fused=True + mesh runs the kernel per-shard under shard_map with
    GLOBAL normalizations (psum'd mask total / batch size, pmax'd
    valid_to) — the update must match the unsharded fused step."""
    from vqvaehmm_tpu.parallel import create_mesh

    model, params, x, u, lengths = _setup(seed=4)
    tx = make_optimizer(1e-3)

    single = make_train_step(model, tx, donate=False, fused=True)
    s1, loss1 = single(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)),
        x, u, lengths, jnp.float32(0.8))

    mesh = create_mesh(8)
    sharded = make_train_step(model, tx, mesh=mesh, donate=False,
                              fused=True)
    s2, loss2 = sharded(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)),
        x, u, lengths, jnp.float32(0.8))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("cfg", [
    dict(C=7, H=48, K=2, H2=16, U=3, B=8, T=32),
    dict(C=3, H=16, K=4, H2=8, U=5, B=24, T=40),
    dict(C=5, H=24, K=3, H2=12, U=4, B=8, T=8),   # minimal T
])
def test_fused_grads_fuzz_configs(cfg):
    """Kernel stays exact across channel counts, K, u_dim, B, T."""
    model = make_model(cfg["C"], cfg["H"], cfg["K"], cfg["H2"],
                       u_dim=cfg["U"], trans_hidden=32)
    params = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(cfg["K"])
    x = jnp.asarray(rng.normal(
        size=(cfg["B"], cfg["C"], cfg["T"])).astype(np.float32))
    u = jnp.asarray(rng.normal(
        size=(cfg["B"], cfg["U"], cfg["T"])).astype(np.float32))
    lengths = jnp.asarray(rng.integers(
        max(cfg["T"] // 2, 3), cfg["T"] + 1, size=cfg["B"]).astype(np.int32))
    ref_loss, ref_grads = jax.value_and_grad(model.compute_loss)(
        params, x, u, lengths, 0.9)
    loss, grads = fused_loss_and_grads(model, params, x, u, lengths, 0.9,
                                       interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-5)
    for ref, got in zip(jax.tree_util.tree_leaves(ref_grads),
                        jax.tree_util.tree_leaves(grads)):
        a, b = np.asarray(ref), np.asarray(got)
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=5e-5 * max(np.max(np.abs(a)), 1e-12))


def test_train_step_supported_vmem_guard():
    """The support predicate admits the benchmark config and rejects
    configs whose working set exceeds the VMEM budget (those would fail
    at Mosaic compile time).  The train kernel runs under a raised 64 MB
    scoped-VMEM limit with a 48 MB block budget (BENCH_NOTES.md "Raised
    scoped-VMEM limit"), so an H=256 config (38.6 MB block at bb=16) is
    admitted — verified to compile, run, and match the interpret-mode
    math on TPU — while an H=1024 config (158 MB at the smallest legal
    block) is still refused."""
    from vqvaehmm_tpu.core.config import ModelConfig
    from vqvaehmm_tpu.ops.pallas_train import train_step_supported

    bench = ModelConfig(input_dim=5, hidden_dim=64, K=3, hidden_dim2=32,
                        u_dim=4, trans_hidden=128)
    assert train_step_supported(bench, 64, 200)
    assert not train_step_supported(bench, 64, 50)    # T % 8 != 0
    assert not train_step_supported(bench, 3, 200)    # no lane block
    big = ModelConfig(input_dim=5, hidden_dim=256, K=3, hidden_dim2=128,
                      u_dim=4, trans_hidden=256)
    assert train_step_supported(big, 64, 200)         # fits raised budget
    huge = ModelConfig(input_dim=5, hidden_dim=1024, K=3, hidden_dim2=512,
                       u_dim=4, trans_hidden=1024)
    assert not train_step_supported(huge, 64, 200)    # VMEM budget


def test_pick_block_b_prefers_largest_fitting():
    """With a rows estimate, the block picker must return the LARGEST
    VMEM-fitting lane-legal block (production probe: block_b 1 -> 4 is
    ~6.5% faster at B=256/T=512/K=8); without one, the smallest legal
    block (the conservative historical default)."""
    from vqvaehmm_tpu.ops.pallas_train import _pick_block_b, fits_vmem

    # T=512: every block size is lane-legal (512 % 128 == 0... gcd 128)
    assert _pick_block_b(256, 512) == 1
    bb = _pick_block_b(256, 512, rows=1240)
    assert bb == 4
    assert fits_vmem(1240, bb, 512) and not fits_vmem(1240, 8, 512)
    # benchmark shape: bb0=16 and only 16 fits at ~990 rows under the
    # default 14 MB budget; the train kernel's raised 48 MB budget
    # admits bb=32 (measured 0.6% faster at 64 MB scoped VMEM)
    assert _pick_block_b(64, 200) == 16
    assert _pick_block_b(64, 200, rows=990) == 16
    from vqvaehmm_tpu.ops.pallas_train import _TRAIN_VMEM_BUDGET
    assert _pick_block_b(64, 200, rows=990,
                         budget_bytes=_TRAIN_VMEM_BUDGET) == 32
    # nothing fits -> 0 (callers fall back to the XLA path)
    assert _pick_block_b(256, 512, rows=10 ** 6) == 0


def test_fused_grads_large_hidden_interpret_parity():
    """Kernel math at a raised-VMEM-budget config (H=128/H2=64: admitted
    only since the 64 MB scoped limit, BENCH_NOTES "Raised scoped-VMEM
    limit").  Interpret mode runs true f32, so this pins the MATH at the
    deeper-accumulation shape; the on-MXU single-pass-dot deviation at
    such shapes is documented, not tested (parity runs use the XLA
    step)."""
    model, params, x, u, lengths = _setup(
        B=8, T=48, seed=5)
    big = make_model(5, 128, 3, 64, u_dim=4, trans_hidden=128)
    params = big.init(jax.random.PRNGKey(1))
    ref_loss, ref_grads = jax.value_and_grad(big.compute_loss)(
        params, x, u, lengths, 1.0)
    loss, grads = fused_loss_and_grads(big, params, x, u, lengths, 1.0,
                                       interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-5)
    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(grads)[0]}
    for ks, ref in flat_ref.items():
        a, b = np.asarray(ref), np.asarray(flat[ks])
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=5e-5 * max(np.max(np.abs(a)), 1e-12),
            err_msg=ks)
