"""Fused Pallas Viterbi vs the scan implementation (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.ops import hmm as hops
from vqvaehmm_tpu.ops.pallas_hmm import viterbi_pallas


def _inputs(B, T, K, seed=0):
    rng = np.random.default_rng(seed)
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    log_A = np.log(rng.dirichlet(np.ones(K), size=(B, T, K))
                   ).astype(np.float32)
    log_obs = rng.normal(size=(B, T, K)).astype(np.float32)
    return log_pi, log_A, log_obs


@pytest.mark.parametrize("B,T,K", [(5, 24, 3), (130, 16, 3), (3, 50, 4)])
def test_matches_scan(B, T, K):
    log_pi, log_A, log_obs = _inputs(B, T, K, seed=B)
    ref = hops.viterbi(jnp.asarray(log_pi), jnp.asarray(log_A),
                       jnp.asarray(log_obs))
    got = viterbi_pallas(jnp.asarray(log_pi), jnp.asarray(log_A),
                         jnp.asarray(log_obs))
    np.testing.assert_array_equal(np.asarray(got.states),
                                  np.asarray(ref.states))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(ref.score),
                               atol=1e-5)


def test_matches_scan_ragged():
    log_pi, log_A, log_obs = _inputs(6, 20, 3, seed=9)
    lengths = np.array([20, 7, 13, 20, 4, 19], np.int32)
    ref = hops.viterbi(jnp.asarray(log_pi), jnp.asarray(log_A),
                       jnp.asarray(log_obs), jnp.asarray(lengths))
    got = viterbi_pallas(jnp.asarray(log_pi), jnp.asarray(log_A),
                         jnp.asarray(log_obs), jnp.asarray(lengths))
    for b, L in enumerate(lengths):
        np.testing.assert_array_equal(np.asarray(got.states)[b, :L],
                                      np.asarray(ref.states)[b, :L])
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(ref.score),
                               atol=1e-5)


def test_stationary_transition_broadcast():
    rng = np.random.default_rng(2)
    K = 3
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    log_A = np.log(rng.dirichlet(np.ones(K), size=K)).astype(np.float32)
    log_obs = rng.normal(size=(4, 30, K)).astype(np.float32)
    ref = hops.viterbi(jnp.asarray(log_pi), jnp.asarray(log_A),
                       jnp.asarray(log_obs))
    got = viterbi_pallas(jnp.asarray(log_pi), jnp.asarray(log_A),
                         jnp.asarray(log_obs))
    np.testing.assert_array_equal(np.asarray(got.states),
                                  np.asarray(ref.states))


def test_posterior_mode_pallas_dispatch():
    """HiddenMarkovModel.posterior_mode(use_pallas=True) matches the scan
    path (the use_pallas=None default picks the kernel on TPU)."""
    from vqvaehmm_tpu.models.hmm import GaussianEmission, HiddenMarkovModel

    rng = np.random.default_rng(5)
    K, B, T = 3, 4, 40
    hmm = HiddenMarkovModel(
        rng.dirichlet(np.ones(K)),
        rng.dirichlet(np.ones(K), size=K),
        GaussianEmission(jnp.asarray(rng.normal(size=(K, 2)), jnp.float32),
                         jnp.ones((K, 2), jnp.float32)))
    x = rng.normal(size=(B, T, 2)).astype(np.float32)
    lengths = np.array([40, 31, 17, 40], np.int32)
    s_scan = hmm.posterior_mode(x, lengths, use_pallas=False)
    s_pal = hmm.posterior_mode(x, lengths, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_pal))


def test_viterbi_vmem_gate_bounds_T():
    """Auto-dispatch must refuse the doubling-scan kernel when its O(T)
    VMEM tapes exceed the scoped budget (found live: a T=2327 whole-panel
    decode was rejected by Mosaic at 24.84 MB), falling back to the scan
    path instead of failing to compile."""
    from vqvaehmm_tpu.ops.pallas_hmm import viterbi_supported

    assert viterbi_supported(200, 3)        # the benchmark shape fits
    assert viterbi_supported(512, 3)
    assert not viterbi_supported(2327, 3)   # the live failure
    assert not viterbi_supported(2000, 8)


def test_viterbi_decode_auto_dispatch_long_T(monkeypatch):
    """With the backend gate forced open, a long-T viterbi_decode must
    route to the TILED kernel (VMEM O(chunk)), never the monolithic one
    whose O(T) tapes Mosaic rejects at this T."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvaehmm_tpu import make_model
    from vqvaehmm_tpu.models import vae_hmm as vh

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    T = 2327
    x = jnp.asarray(rng.normal(size=(1, 5, T)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(1, 4, T)).astype(np.float32))

    calls = {"mono": 0, "tiled": 0}
    import vqvaehmm_tpu.ops.pallas_hmm as ph

    real_tiled = ph.viterbi_pallas_tiled

    def spy_mono(*a, **k):
        calls["mono"] += 1
        return ph.viterbi_pallas.__wrapped__(*a, **k)  # pragma: no cover

    def spy_tiled(*a, **k):
        calls["tiled"] += 1
        k["interpret"] = True   # backend is faked; stay off Mosaic
        return real_tiled(*a, **k)

    monkeypatch.setattr(ph, "viterbi_pallas", spy_mono)
    monkeypatch.setattr(ph, "viterbi_pallas_tiled", spy_tiled)
    monkeypatch.setattr(vh.jax, "default_backend", lambda: "tpu")
    states = model.viterbi_decode(params, x, u)
    assert states.shape == (1, T)
    assert calls["mono"] == 0, "long-T decode must not take the O(T) kernel"
    assert calls["tiled"] == 1
    # At this T, f32 reassociation in the doubling scan can flip ULP-tied
    # steps (module docstring), so compare PATH SCORES, not states: both
    # decodes must be (equal-score) MAP paths under the same potentials.
    ref = model.viterbi_decode(params, x, u, use_pallas=False)
    log_pi, log_A = model.prior(params, u)
    log_obs = model._hmm_evidence(params, x, None)

    def path_score(s):
        s = np.asarray(s)[0]
        sc = float(np.asarray(log_pi)[s[0]] + np.asarray(log_obs)[0, 0, s[0]])
        A, O = np.asarray(log_A)[0], np.asarray(log_obs)[0]
        for t in range(1, T):
            sc += float(A[t, s[t - 1], s[t]] + O[t, s[t]])
        return sc

    agree = float((np.asarray(states) == np.asarray(ref)).mean())
    assert agree > 0.995, agree
    np.testing.assert_allclose(path_score(states), path_score(ref),
                               rtol=0, atol=5e-3)


@pytest.mark.parametrize("B,T,K,chunk,ragged", [
    (3, 300, 3, 128, False),    # 3 chunks, T not a chunk multiple
    (2, 257, 4, 128, True),     # ragged + one-past-boundary T
    (5, 128, 3, 128, False),    # exactly one chunk
    (2, 513, 5, 256, True),
])
def test_tiled_matches_scan(B, T, K, chunk, ragged):
    from vqvaehmm_tpu.ops.pallas_hmm import viterbi_pallas_tiled

    log_pi, log_A, log_obs = _inputs(B, T, K, seed=T)
    lengths = None
    if ragged:
        rng = np.random.default_rng(T)
        lengths = jnp.asarray(rng.integers(T // 3, T + 1, size=B), jnp.int32)
    ref = hops.viterbi(jnp.asarray(log_pi), jnp.asarray(log_A),
                       jnp.asarray(log_obs), lengths)
    got = viterbi_pallas_tiled(jnp.asarray(log_pi), jnp.asarray(log_A),
                               jnp.asarray(log_obs), lengths, chunk=chunk)
    if lengths is None:
        np.testing.assert_array_equal(np.asarray(got.states),
                                      np.asarray(ref.states))
    else:
        for b, L in enumerate(np.asarray(lengths)):
            np.testing.assert_array_equal(np.asarray(got.states)[b, :L],
                                          np.asarray(ref.states)[b, :L])
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(ref.score),
                               atol=1e-4)


def test_tiled_gate_and_chunk_pick():
    """_pick_chunk bounds the tiled working set: K=3 gets a large chunk,
    K=8 a small one, and enormous K refuses (callers then take scan)."""
    from vqvaehmm_tpu.ops.pallas_hmm import (_pick_chunk,
                                             viterbi_tiled_supported)

    assert _pick_chunk(3) >= 256
    assert _pick_chunk(8) >= 128
    assert _pick_chunk(40) == 0
    assert viterbi_tiled_supported(3) and not viterbi_tiled_supported(40)
