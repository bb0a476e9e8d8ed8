"""Driver-contract checks: entry() compiles, dryrun_multichip runs on the
8-device virtual CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    mu, logvar, q = out
    assert mu.shape == (64, 5, 200)
    assert logvar.shape == (64, 5, 200)
    assert q.shape == (64, 3, 200)
    np.testing.assert_allclose(np.asarray(q).sum(axis=1), 1.0, atol=1e-5)


def test_dryrun_multichip_8():
    assert jax.device_count() >= 8
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
