"""Fused serving forward (ops/pallas_infer.py) vs the XLA path.

Interpret mode on CPU; on TPU the same kernel compiles via Mosaic (the
train/decode kernels sharing this layout are exercised there by
scripts/tpu_kernel_check.py).
"""

import jax
import numpy as np
import pytest

from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.ops.pallas_infer import (batch_multiple, fused_forward,
                                           supported)
from vqvaehmm_tpu.ops.precise import psoftmax


@pytest.fixture(scope="module")
def setup():
    model = make_model(5, 16, 3, 8, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _xla_forward(model, params, x, valid_to=None):
    logits = model.encode(params, x, valid_to=valid_to)
    q = psoftmax(logits, axis=1)
    mu, logvar = model.decode(params, q, valid_to=valid_to)
    return mu, logvar, q


@pytest.mark.parametrize("B,T", [(4, 24), (8, 16), (2, 40)])
def test_fused_forward_matches_xla(setup, B, T):
    model, params = setup
    rng = np.random.default_rng(B * 100 + T)
    x = rng.normal(size=(B, 5, T)).astype(np.float32)
    got = fused_forward(model, params, x, interpret=True)
    want = _xla_forward(model, params, x)
    for g, w, name in zip(got, want, ("mu", "logvar", "q")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, err_msg=name)


def test_fused_forward_vector_valid_to(setup):
    """Per-sequence bounds: each row bounded at its own length matches the
    XLA path given the same vector, and each row equals a solo run of that
    row (the micro-batcher's bit-exactness requirement)."""
    model, params = setup
    rng = np.random.default_rng(7)
    B, T = 4, 24
    x = rng.normal(size=(B, 5, T)).astype(np.float32)
    lengths = np.array([24, 17, 9, 20], np.int32)
    # serving zero-pads each request to its bucket: data beyond a row's
    # length is zero (valid_to masks activations AFTER conv1, so the
    # boundary column reads one input column past the length — identical
    # only when both paths pad with zeros, as the servers do)
    for r in range(B):
        x[r, :, lengths[r]:] = 0.0
    import jax.numpy as jnp

    got = fused_forward(model, params, x, valid_to=jnp.asarray(lengths),
                        interpret=True)
    want = _xla_forward(model, params, x, valid_to=jnp.asarray(lengths))
    for g, w, name in zip(got, want, ("mu", "logvar", "q")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, err_msg=name)
    # row r out of the batch == the same row run solo (zero-padded tail)
    for r in range(B):
        solo_x = np.zeros((1, 5, T), np.float32)
        solo_x[0, :, :lengths[r]] = x[r, :, :lengths[r]]
        solo = fused_forward(model, params, solo_x,
                             valid_to=jnp.asarray(lengths[r:r + 1]),
                             interpret=True)
        L = lengths[r]
        for g, s, name in zip(got, solo, ("mu", "logvar", "q")):
            np.testing.assert_allclose(np.asarray(g)[r, :, :L],
                                       np.asarray(s)[0, :, :L],
                                       atol=2e-6, err_msg=f"row {r} {name}")


def test_infer_forward_dispatch(setup):
    """VAEHMM.infer_forward: use_pallas paths agree; off-TPU default is
    the XLA path."""
    model, params = setup
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    a = model.infer_forward(params, x, use_pallas=False)
    b = _xla_forward(model, params, x)
    for g, w in zip(a, b):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_supported_and_batch_multiple(setup):
    model, _ = setup
    assert supported(model.cfg, 16, 200)
    assert not supported(model.cfg, 16, 201)   # T % 8
    assert batch_multiple(32) == 4
    assert batch_multiple(64) == 2
    assert batch_multiple(128) == 1
    assert batch_multiple(200) == 16


@pytest.mark.parametrize("cfg", [
    dict(C=7, H=48, K=2, H2=16, B=8, T=32),
    dict(C=3, H=16, K=5, H2=8, B=24, T=40),
    dict(C=5, H=24, K=3, H2=12, B=8, T=8),   # minimal T
    dict(C=1, H=8, K=2, H2=4, B=4, T=16),    # single channel
])
def test_fused_forward_fuzz_configs(cfg):
    """Kernel stays exact across channel counts, K, B, T."""
    model = make_model(cfg["C"], cfg["H"], cfg["K"], cfg["H2"],
                       u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(cfg["K"]))
    rng = np.random.default_rng(cfg["B"])
    x = rng.normal(size=(cfg["B"], cfg["C"], cfg["T"])).astype(np.float32)
    got = fused_forward(model, params, x, interpret=True)
    want = _xla_forward(model, params, x)
    for g, w, name in zip(got, want, ("mu", "logvar", "q")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-5, err_msg=name)


def test_infer_forward_mesh_matches_single_device(setup):
    """Bulk scoring across the 8-device virtual mesh: batch-sharded
    forward equals the unsharded one (no cross-sequence math)."""
    import jax.numpy as jnp

    from vqvaehmm_tpu.parallel import create_mesh

    model, params = setup
    mesh = create_mesh(8)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(16, 5, 24)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(8, 25, size=16).astype(np.int32))
    ref = model.infer_forward(params, x, valid_to=lengths)
    got = model.infer_forward(params, x, valid_to=lengths, mesh=mesh)
    for g, w, name in zip(got, ref, ("mu", "logvar", "q")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, err_msg=name)
    # scalar bound and no bound also shard cleanly
    got2 = model.infer_forward(params, x, valid_to=jnp.asarray(24),
                               mesh=mesh)
    ref2 = model.infer_forward(params, x, valid_to=jnp.asarray(24))
    np.testing.assert_allclose(np.asarray(got2[2]), np.asarray(ref2[2]),
                               atol=1e-6)
    got3 = model.infer_forward(params, x, mesh=mesh)
    ref3 = model.infer_forward(params, x)
    np.testing.assert_allclose(np.asarray(got3[2]), np.asarray(ref3[2]),
                               atol=1e-6)
