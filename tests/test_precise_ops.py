"""Accuracy tests for the precise transcendental kernels (ops/precise.py).

The backend's built-in exp/log are fast-math approximations (~1.2e-4 rel
error on log in this XLA build); these kernels must stay within ~1e-6 of
float64 ground truth for the ELBO parity bar to be reachable.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vqvaehmm_tpu.ops.precise import (pexp, plog, plog_softmax, plogsumexp,
                                      psoftmax)


def test_plog_accuracy(rng):
    x = (np.abs(rng.normal(size=5000)).astype(np.float32)
         * np.exp(rng.uniform(-8, 8, 5000)).astype(np.float32))
    got = np.asarray(jax.jit(plog)(jnp.asarray(x)))
    ref = np.log(x.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_pexp_accuracy(rng):
    x = rng.uniform(-80, 80, 5000).astype(np.float32)
    got = np.asarray(jax.jit(pexp)(jnp.asarray(x)))
    ref = np.exp(x.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_plogsumexp_and_softmax(rng):
    z = (rng.normal(size=(500, 7)) * 3).astype(np.float32)
    zr = z.astype(np.float64)
    m = zr.max(-1, keepdims=True)
    lse = np.log(np.exp(zr - m).sum(-1)) + m[:, 0]
    got = np.asarray(jax.jit(lambda a: plogsumexp(a, axis=-1))(jnp.asarray(z)))
    np.testing.assert_allclose(got, lse, rtol=1e-6, atol=1e-6)

    lsm = zr - (np.log(np.exp(zr - m).sum(-1, keepdims=True)) + m)
    got = np.asarray(jax.jit(lambda a: plog_softmax(a, axis=-1))(jnp.asarray(z)))
    np.testing.assert_allclose(got, lsm, rtol=1e-5, atol=2e-6)

    sm = np.exp(lsm)
    got = np.asarray(jax.jit(lambda a: psoftmax(a, axis=-1))(jnp.asarray(z)))
    np.testing.assert_allclose(got, sm, atol=1e-6)


def test_neg_inf_safety():
    z = jnp.asarray(np.array([[0.0, -np.inf, 1.0]], np.float32))
    lse = float(plogsumexp(z, axis=-1)[0])
    assert abs(lse - np.log(1 + np.e)) < 1e-6
    sm = np.asarray(psoftmax(z, axis=-1)[0])
    assert sm[1] == 0.0
    np.testing.assert_allclose(sm.sum(), 1.0, atol=1e-6)
    # all -inf row stays -inf in logsumexp
    z2 = jnp.asarray(np.full((1, 3), -np.inf, np.float32))
    assert float(plogsumexp(z2, axis=-1)[0]) == -np.inf


def test_edge_values():
    x = jnp.asarray(np.array([0.0, 1.0, np.inf], np.float32))
    out = np.asarray(plog(x))
    assert out[0] == -np.inf and out[1] == 0.0 and out[2] == np.inf
    y = jnp.asarray(np.array([-1000.0, 0.0, 1000.0], np.float32))
    oe = np.asarray(pexp(y))
    assert oe[0] == 0.0 and abs(oe[1] - 1.0) < 1e-7 and oe[2] == np.inf
