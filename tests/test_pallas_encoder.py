"""Fused Pallas encoder vs the XLA conv path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.ops.pallas_encoder import fused_encode


@pytest.fixture(scope="module")
def setup():
    model = make_model(5, 64, 3, 32, u_dim=4, trans_hidden=128)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 5, 40)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(10, 41, size=8).astype(np.int32))
    return model, params, x, lengths


def test_matches_xla_path(setup):
    model, params, x, _ = setup
    with jax.default_matmul_precision("float32"):
        ref = model.encode(params, x)
        got = fused_encode(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_matches_xla_path_masked(setup):
    model, params, x, lengths = setup
    vt = jnp.max(lengths)
    with jax.default_matmul_precision("float32"):
        ref = model.encode(params, x, valid_to=vt)
        got = fused_encode(params, x, valid_to=vt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_model_fused_flag(setup):
    model, params, x, _ = setup
    with jax.default_matmul_precision("float32"):
        q_ref = model.posterior(params, x)
        q_fused = model.posterior(params, x, fused=True)
    np.testing.assert_allclose(np.asarray(q_fused), np.asarray(q_ref),
                               atol=1e-5)


def test_batch_boundary_isolation():
    """Rolling over the flattened (C, B*T) axis must NOT leak values
    between adjacent batch rows."""
    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 5, 16)).astype(np.float32)
    b = rng.normal(size=(1, 5, 16)).astype(np.float32)
    both = jnp.asarray(np.concatenate([a, b], axis=0))
    with jax.default_matmul_precision("float32"):
        combined = fused_encode(params, both)
        solo_a = fused_encode(params, jnp.asarray(a))
        solo_b = fused_encode(params, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(combined[0]),
                               np.asarray(solo_a[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(combined[1]),
                               np.asarray(solo_b[0]), atol=1e-5)


def test_fused_encode_vector_valid_to(rng):
    """Per-sequence (B,) bounds match the XLA path (the micro-batcher's
    unified solo/batched geometry feeds vectors here too)."""
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.ops.pallas_encoder import fused_encode

    model = make_model(5, 8, 3, 4, u_dim=2, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    B, T = 4, 24
    x = rng.normal(size=(B, 5, T)).astype(np.float32)
    lengths = np.array([24, 17, 9, 20], np.int32)
    for r in range(B):
        x[r, :, lengths[r]:] = 0.0
    got = fused_encode(params, jnp.asarray(x),
                       valid_to=jnp.asarray(lengths), interpret=True)
    want = model.encode(params, jnp.asarray(x),
                        valid_to=jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_nonzero_tail_does_not_leak(setup):
    """valid_to semantics with a NON-zero tail (x sliced from a longer
    panel, not zero-padded): both paths must equal encoding the
    zero-padded copy — the tail must not leak into t < valid_to through
    conv1's receptive field."""
    model, params, x, lengths = setup
    x = np.asarray(x).copy()
    vt = int(np.max(np.asarray(lengths)))
    rng = np.random.default_rng(3)
    x[:, :, vt:] = rng.normal(size=x[:, :, vt:].shape)  # garbage tail

    xz = x.copy()
    xz[:, :, vt:] = 0.0
    with jax.default_matmul_precision("float32"):
        want = model.encode(params, jnp.asarray(xz), valid_to=vt)
        got_xla = model.encode(params, jnp.asarray(x), valid_to=vt)
        got_pal = fused_encode(params, jnp.asarray(x), valid_to=vt)
    np.testing.assert_allclose(np.asarray(got_xla)[:, :, :vt],
                               np.asarray(want)[:, :, :vt], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_pal)[:, :, :vt],
                               np.asarray(want)[:, :, :vt], atol=1e-5)
