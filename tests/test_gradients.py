"""Finite-difference gradient checks.

Regression guard for a real bug: the precise transcendental kernels
(ops/precise.py) route data dependence through bitcast_convert_type, which
autodiff silently cannot differentiate — without their custom_jvp rules the
ELBO gradient was garbage and training diverged.  These tests pin the
analytic gradient to central differences.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.ops.precise import pexp, plog, plog_softmax, psoftmax


def test_plog_pexp_grads():
    x = jnp.asarray(np.array([0.3, 1.7, 42.0], np.float32))
    np.testing.assert_allclose(np.asarray(jax.vmap(jax.grad(plog))(x)),
                               1.0 / np.asarray(x), rtol=1e-5)
    y = jnp.asarray(np.array([-2.0, 0.1, 3.0], np.float32))
    np.testing.assert_allclose(np.asarray(jax.vmap(jax.grad(pexp))(y)),
                               np.exp(np.asarray(y)), rtol=1e-5)


def test_softmax_grads_match_reference():
    """plog_softmax / psoftmax grads equal jax.nn counterparts."""
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 5))
                    .astype(np.float32))

    def f_precise(a):
        return (psoftmax(a, -1) * plog_softmax(a, -1)).sum()

    def f_ref(a):
        return (jax.nn.softmax(a, -1) * jax.nn.log_softmax(a, -1)).sum()

    g1 = np.asarray(jax.grad(f_precise)(z))
    g2 = np.asarray(jax.grad(f_ref)(z))
    np.testing.assert_allclose(g1, g2, atol=2e-4)


def test_elbo_gradient_finite_difference():
    """Directional derivatives of the full ELBO match central differences."""
    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, C, T, U = 4, 5, 16, 4
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, U, T)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(8, T + 1, size=B).astype(np.int32))

    loss_fn = jax.jit(lambda p: model.compute_loss(p, x, u, lengths, 1.0))
    g = jax.jit(jax.grad(lambda p: model.compute_loss(p, x, u, lengths, 1.0))
                )(params)
    flat_p, unravel = jax.flatten_util.ravel_pytree(params)
    flat_g, _ = jax.flatten_util.ravel_pytree(g)

    for seed in range(3):
        d = rng.normal(size=flat_p.shape).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d))
        eps = 1e-3
        fd = (float(loss_fn(unravel(flat_p + eps * d)))
              - float(loss_fn(unravel(flat_p - eps * d)))) / (2 * eps)
        an = float(flat_g @ d)
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)

    # a gradient step must reduce the loss
    l0 = float(loss_fn(params))
    l1 = float(loss_fn(unravel(flat_p - 1e-2 * flat_g)))
    assert l1 < l0


def test_grad_through_posterior_auto_dispatch(monkeypatch):
    """jax.grad through posterior() with the default fused=None must take
    the XLA path even when the TPU auto-dispatch gate would otherwise pick
    the (VJP-less) Pallas encoder (round-2 advisor finding).  Simulated by
    forcing the backend/shape gates open; the autodiff-tracer gate must be
    the one that says no."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.models import vae_hmm as vh

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 5, 16)).astype(np.float32))

    monkeypatch.setattr(vh.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr("vqvaehmm_tpu.ops.pallas_encoder.encode_supported",
                        lambda cfg, B, T: True)

    def loss(p):
        return model.posterior(p, x).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # outside autodiff the forced-open gate still picks the fused path
    # (we only verify the decision, not the kernel, on CPU)
    assert vh._under_autodiff(params, x) is False


def test_grad_through_infer_forward_takes_xla_path(monkeypatch):
    """Same autodiff gate for the serving forward: jax.grad through
    infer_forward with use_pallas=None must take the XLA path when the
    TPU gate would otherwise pick the VJP-less fused kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.models import vae_hmm as vh

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 5, 16)).astype(np.float32))

    monkeypatch.setattr(vh.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr("vqvaehmm_tpu.ops.pallas_infer.supported",
                        lambda cfg, B, T: True)

    def loss(xx):
        mu, logvar, q = model.infer_forward(params, xx)
        return (mu ** 2).sum()

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_grad_around_viterbi_decode_takes_scan_path(monkeypatch):
    """viterbi_decode inside a differentiated computation must trace the
    lax.scan path when the TPU gate would otherwise pick the VJP-less
    doubling-scan kernel (states are ints — zero cotangent — but the
    kernel itself cannot even trace under AD)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.models import vae_hmm as vh

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32))

    monkeypatch.setattr(vh.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr("vqvaehmm_tpu.ops.pallas_hmm.viterbi_supported",
                        lambda T, K: True)

    def loss(xx):
        states = model.viterbi_decode(params, xx, u)
        onehot = jax.nn.one_hot(states, 3).transpose(0, 2, 1)
        mu, _ = model.decode(params, onehot)
        return (mu ** 2).sum()

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_forced_use_pallas_raises_on_unsupported_shapes():
    """Explicit use_pallas=True is a FORCE: unsupported shapes raise with
    a clear message instead of silently measuring the XLA path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from vqvaehmm_tpu import make_model

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 15)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(2, 4, 15)).astype(np.float32))

    with pytest.raises(ValueError, match="use_pallas=True forced"):
        model.infer_forward(params, x, use_pallas=True)
    with pytest.raises(ValueError, match="use_pallas=True forced"):
        model._evidence_inputs(params, x, u, None, True)
