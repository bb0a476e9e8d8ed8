"""Config-driven pipeline + evaluation CLIs end-to-end (tmp dirs, real
files), plus checkpoint resume."""

import json
import os

import numpy as np
import pytest

from vqvaehmm_tpu.data.synthetic import synthetic_sequences


@pytest.fixture
def tiny_config(tmp_path):
    xs, us, _ = synthetic_sequences(4, 120, 5, 4, 3, seed=0)
    np.save(tmp_path / "x.npy", xs)
    np.save(tmp_path / "u.npy", us)
    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 8, "K": 3, "hidden_dim2": 4,
                  "u_dim": 4, "trans_hidden": 8},
        "data": {"x_sequences_path": str(tmp_path / "x.npy"),
                 "u_sequences_path": str(tmp_path / "u.npy"),
                 "min_len": 16, "max_len": 48, "samples_per_epoch": 32},
        "training": {"epochs": 2, "lr": 1e-3, "batch_size": 8,
                     "checkpoint_dir": str(tmp_path / "ckpt"), "seed": 1},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p), tmp_path


def test_train_pipeline_end_to_end(tiny_config):
    cfg_path, tmp = tiny_config
    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    state = TrainPipeline(load_config(cfg_path)).train(log_fn=None)
    assert int(state.step) == 2 * (32 // 8)
    assert (tmp / "ckpt" / "vae_hmm_trained.npz").exists()


def test_steps_per_call_chunking_matches_whole_epoch(tiny_config):
    """training.steps_per_call bounds the per-dispatch scan length; the
    optimizer trajectory must be IDENTICAL to the whole-epoch scan
    (4 batches/epoch chunked as 3+1 exercises the remainder executable).
    The knob existed in TrainConfig since round 1 with no implementing
    code — the exact gap SURVEY.md flags in the reference's save_freq."""
    import jax

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, tmp = tiny_config
    raw = json.loads(open(cfg_path).read())

    raw["training"]["checkpoint_dir"] = str(tmp / "ck_whole")
    p0 = tmp / "cfg0.json"
    p0.write_text(json.dumps(raw))
    s_whole = TrainPipeline(load_config(str(p0))).train(log_fn=None)

    raw["training"]["steps_per_call"] = 3
    raw["training"]["checkpoint_dir"] = str(tmp / "ck_chunk")
    p3 = tmp / "cfg3.json"
    p3.write_text(json.dumps(raw))
    s_chunk = TrainPipeline(load_config(str(p3))).train(log_fn=None)

    assert int(s_whole.step) == int(s_chunk.step)
    for a, b in zip(jax.tree_util.tree_leaves(s_whole.params),
                    jax.tree_util.tree_leaves(s_chunk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_pipeline_cli_with_overrides(tiny_config):
    cfg_path, tmp = tiny_config
    from vqvaehmm_tpu.train.pipeline import main

    rc = main([cfg_path, "training.epochs=1"])
    assert rc == 0


def test_eval_cli(tiny_config):
    cfg_path, tmp = tiny_config
    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.eval.evaluate import evaluate
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    TrainPipeline(load_config(cfg_path)).train(log_fn=None)
    xs, us, _ = synthetic_sequences(2, 80, 5, 4, 3, seed=1)
    out = str(tmp / "eval.txt")
    mse = evaluate(cfg_path, str(tmp / "ckpt" / "vae_hmm_trained.npz"),
                   data=(xs, us), batch_size=8, output=out, log_fn=None)
    assert np.isfinite(mse) and mse > 0
    assert "Mean Recon MSE" in open(out).read()


def test_masked_recon_mse_caches_one_executable():
    """Per-batch eval must not rebuild the jit: one cached executable on
    the model, with params as a TRACED argument (new params, same
    trace)."""
    import jax

    from vqvaehmm_tpu.core.config import ModelConfig
    from vqvaehmm_tpu.eval.evaluate import masked_recon_mse
    from vqvaehmm_tpu.models.vae_hmm import VAEHMM

    model = VAEHMM(ModelConfig(input_dim=5, hidden_dim=8, K=3,
                               hidden_dim2=4, u_dim=4, trans_hidden=8))
    p1 = model.init(jax.random.PRNGKey(0))
    p2 = model.init(jax.random.PRNGKey(1))
    xs, _, _ = synthetic_sequences(1, 40, 5, 4, 3, seed=2)
    x = xs[:1, :, :32]
    lengths = np.array([30], np.int32)

    m1 = masked_recon_mse(model, p1, x, lengths)
    fn = model._eval_mse_jit
    m2 = masked_recon_mse(model, p2, x, lengths)
    assert model._eval_mse_jit is fn
    assert np.isfinite(m1) and np.isfinite(m2) and m1 != m2


def test_checkpoint_resume(tiny_config):
    """Training resumes exactly: params + optimizer state + step."""
    cfg_path, tmp = tiny_config
    import jax
    import jax.numpy as jnp

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.checkpoint import load_checkpoint, save_checkpoint
    from vqvaehmm_tpu.models.vae_hmm import VAEHMM
    from vqvaehmm_tpu.train.trainer import TrainState, make_optimizer

    cfg = load_config(cfg_path)
    model = VAEHMM(cfg.model)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState(params, tx.init(params), jnp.asarray(7, jnp.int32))

    path = str(tmp / "resume_ckpt")
    save_checkpoint(path, state, metadata={"note": "test"})
    template = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    restored = load_checkpoint(path, template)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gmm_pipeline(rng):
    from vqvaehmm_tpu.train.gmm_pipeline import (benchmark_equal_weight,
                                                 train_improved_system)

    T, A = 300, 4
    returns = rng.normal(5e-4, 0.01, size=(T, A)).astype(np.float32)
    sys = train_improved_system(returns, n_regimes=3, hidden_dim=8,
                                num_epochs=30, patience=10, log_fn=None)
    assert sys.detector.fitted
    assert len(sys.history) >= 1
    probs = sys.detector.predict_proba(
        np.random.default_rng(1).normal(size=(10, 13)).astype(np.float32))
    assert probs.shape == (10, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    bench = benchmark_equal_weight(returns)
    assert np.isfinite(bench["sharpe_ratio"])
    assert bench["final_value"] > 0


class _RefDetector:
    """Stand-in for the reference's pickled SimpleRegimeDetector
    (train_simple.py:10-28): a wrapper exposing .gmm (module-level so
    pickle can resolve it)."""

    def __init__(self, gmm):
        self.n_regimes = gmm.n_components
        self.gmm = gmm


def test_gmm_from_sklearn_migration(rng, tmp_path):
    """SimpleRegimeDetector.from_sklearn consumes a fitted sklearn
    GaussianMixture — the estimator inside the reference's
    regime_detector.pkl (train_simple.py:190-192) — with matching
    responsibilities, through both the raw estimator and the
    reference-shaped pickled wrapper."""
    import pickle

    sklearn_mix = pytest.importorskip("sklearn.mixture")

    from vqvaehmm_tpu.models.gmm import SimpleRegimeDetector

    # well-separated 2-component features
    f = np.concatenate([rng.normal(-2, 0.5, size=(120, 4)),
                        rng.normal(2, 0.5, size=(120, 4))]).astype(np.float32)
    sk = sklearn_mix.GaussianMixture(n_components=2,
                                     covariance_type="full",
                                     random_state=42, n_init=3).fit(f)
    det = SimpleRegimeDetector.from_sklearn(sk)
    test_f = rng.normal(0, 2.5, size=(40, 4)).astype(np.float32)
    np.testing.assert_allclose(det.predict_proba(test_f),
                               sk.predict_proba(test_f), atol=1e-4)
    np.testing.assert_array_equal(det.predict_regime(test_f),
                                  sk.predict(test_f))

    # the reference pickles a wrapper object exposing .gmm; emulate its
    # regime_detector.pkl round-trip
    p = tmp_path / "regime_detector.pkl"
    p.write_bytes(pickle.dumps(_RefDetector(sk)))
    det2 = SimpleRegimeDetector.from_sklearn(pickle.loads(p.read_bytes()))
    np.testing.assert_allclose(det2.predict_proba(test_f),
                               sk.predict_proba(test_f), atol=1e-4)

    # unfitted estimator -> clear error; diag covariance -> clear error
    with pytest.raises(ValueError, match="FITTED"):
        SimpleRegimeDetector.from_sklearn(
            sklearn_mix.GaussianMixture(n_components=2))
    sk_diag = sklearn_mix.GaussianMixture(
        n_components=2, covariance_type="diag", random_state=0).fit(f)
    with pytest.raises(ValueError, match="full"):
        SimpleRegimeDetector.from_sklearn(sk_diag)


def test_gmm_dropout_training_mode(rng):
    """dropout=True trains with the head's Dropout(0.2) active (the
    reference torch module's train-mode behavior, train_simple.py:42,45):
    a different trajectory than the deterministic default, same-seed
    reproducible, and still early-stoppable."""
    from vqvaehmm_tpu.train.gmm_pipeline import train_improved_system

    T, A = 250, 3
    returns = rng.normal(5e-4, 0.01, size=(T, A)).astype(np.float32)
    kw = dict(n_regimes=2, hidden_dim=8, num_epochs=8, patience=8,
              log_fn=None)
    det = train_improved_system(returns, dropout=False, **kw)
    d1 = train_improved_system(returns, dropout=True, **kw)
    d2 = train_improved_system(returns, dropout=True, **kw)
    assert d1.history != det.history
    assert d1.history == d2.history


def test_gmm_temporal_chain_roundtrip_and_smoothing(tmp_path):
    """train_improved_system(temporal=True) fits regime dynamics over
    the GMM's own emissions; the chain persists through save/load with
    identical marginals, and on a sticky regime-switching panel the
    smoothed decode switches less than the static argmax while the
    static path stays bit-identical to temporal=False."""
    from vqvaehmm_tpu.models.gmm import prepare_regime_features
    from vqvaehmm_tpu.serve.cli import main as cli_main
    from vqvaehmm_tpu.train.gmm_pipeline import (load_improved_system,
                                                 train_improved_system)

    # sticky 2-regime return panel (calm vs turbulent)
    rng_ = np.random.default_rng(3)
    T, A = 400, 4
    z, zs = 0, []
    for _ in range(T):
        if rng_.random() < 0.04:
            z = 1 - z
        zs.append(z)
    zs = np.array(zs)
    scale = np.where(zs == 0, 0.005, 0.025)[:, None]
    drift = np.where(zs == 0, 8e-4, -8e-4)[:, None]
    returns = (drift + scale * rng_.normal(size=(T, A))).astype(np.float32)

    sys_t = train_improved_system(returns, n_regimes=2, hidden_dim=8,
                                  num_epochs=10, patience=5,
                                  temporal=True, log_fn=None)
    assert sys_t.chain is not None
    sys_s = train_improved_system(returns, n_regimes=2, hidden_dim=8,
                                  num_epochs=10, patience=5, log_fn=None)
    assert sys_s.chain is None

    feats = prepare_regime_features(returns)
    # static posterior unchanged by the temporal flag
    np.testing.assert_array_equal(sys_t.detector.predict_proba(feats),
                                  sys_s.detector.predict_proba(feats))
    static_pred = sys_s.regime_marginals(feats).argmax(-1)
    smooth_pred = sys_t.regime_marginals(feats).argmax(-1)
    flips = lambda s: int((np.diff(s) != 0).sum())
    assert flips(smooth_pred) <= flips(static_pred)

    # filtered (causal) marginals: valid distribution, final step equals
    # the smoothed posterior's final step (no future to peek at there)
    filt = sys_t.regime_marginals(feats, mode="filtered")
    smoo = sys_t.regime_marginals(feats, mode="smoothed")
    np.testing.assert_allclose(filt.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(filt[-1], smoo[-1], atol=1e-5)
    with pytest.raises(ValueError, match="unknown mode"):
        sys_t.regime_marginals(feats, mode="viterbi")

    path = str(tmp_path / "temporal_system.npz")
    sys_t.save(path)
    sys_2 = load_improved_system(path)
    assert sys_2.chain is not None
    np.testing.assert_allclose(sys_2.regime_marginals(feats),
                               sys_t.regime_marginals(feats),
                               rtol=0, atol=0)

    # the CLI consumes a temporal archive end-to-end
    data_path = str(tmp_path / "returns.npy")
    np.save(data_path, returns)
    cli_main(["--stack", "gmm", "--checkpoint", path, "--data", data_path])


def test_periodic_save_and_auto_resume(tiny_config):
    """save_freq checkpoints are written and training resumes from them
    (the reference configures save_freq but never implements it)."""
    cfg_path, tmp = tiny_config
    import json as _json

    raw = _json.loads(open(cfg_path).read())
    raw["training"]["epochs"] = 4
    raw["training"]["save_freq"] = 2
    p = tmp / "cfg2.json"
    p.write_text(_json.dumps(raw))

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.checkpoint import load_metadata
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg = load_config(str(p))
    state1 = TrainPipeline(cfg).train(log_fn=None)
    periodic = str(tmp / "ckpt" / "vae_hmm_periodic")
    meta = load_metadata(periodic)
    assert meta is not None and meta["epoch"] == 4

    # a fresh pipeline resumes at epoch 4 == num_epochs -> no extra steps
    state2 = TrainPipeline(cfg).train(log_fn=None)
    assert int(state2.step) == int(state1.step)


def test_gmm_system_save_load_roundtrip(rng, tmp_path):
    """GMM stack persists and reloads with identical predictions —
    covers the reference's train-once/infer-later workflow
    (train_simple.py:185-197 -> inference.py:8-17)."""
    import jax.numpy as jnp

    from vqvaehmm_tpu.models.gmm import prepare_regime_features
    from vqvaehmm_tpu.train.gmm_pipeline import (load_improved_system,
                                                 train_improved_system)

    T, A = 300, 4
    returns = rng.normal(5e-4, 0.01, size=(T, A)).astype(np.float32)
    sys1 = train_improved_system(returns, n_regimes=3, hidden_dim=8,
                                 num_epochs=20, patience=10, log_fn=None)
    path = str(tmp_path / "improved_system.npz")
    sys1.save(path)
    sys2 = load_improved_system(path)

    feats = prepare_regime_features(returns)
    np.testing.assert_array_equal(sys1.detector.predict_regime(feats),
                                  sys2.detector.predict_regime(feats))
    np.testing.assert_allclose(sys1.detector.predict_proba(feats),
                               sys2.detector.predict_proba(feats),
                               rtol=0, atol=0)
    q = jnp.asarray(sys1.detector.predict_proba(feats)[:8])
    np.testing.assert_array_equal(
        np.asarray(sys1.optimizer(sys1.params, q)),
        np.asarray(sys2.optimizer(sys2.params, q)))
    assert sys2.history == [float(h) for h in sys1.history]

    # CLI surface: --stack gmm serves the reloaded archive
    from vqvaehmm_tpu.serve.cli import main as cli_main

    data_path = str(tmp_path / "returns.npy")
    np.save(data_path, returns)
    cli_main(["--stack", "gmm", "--checkpoint", path, "--data", data_path])


def test_pipeline_fused_config(tmp_path):
    """training.fused=true routes through the Pallas step when shapes
    qualify, and falls back to XLA (with a log line) when they don't."""
    import json as _json

    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    def cfg_for(max_len, batch_size):
        cfg = {
            "model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                      "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
            "data": {"min_len": 8, "max_len": max_len,
                     "samples_per_epoch": 2 * batch_size,
                     "x_sequences_path": str(tmp_path / "none.npy")},
            "training": {"batch_size": batch_size, "num_epochs": 1,
                         "learning_rate": 1e-3, "fused": True,
                         "save_freq": 0,
                         "checkpoint_dir": str(tmp_path / f"ck{max_len}")},
        }
        p = tmp_path / f"cfg{max_len}.json"
        p.write_text(_json.dumps(cfg))
        return str(p)

    from vqvaehmm_tpu.core.config import load_config

    logs = []
    pipe = TrainPipeline(load_config(cfg_for(32, 8)))
    state = pipe.train(log_fn=logs.append, resume=False)
    assert int(state.step) > 0
    assert not any("unsupported" in s for s in logs)

    logs2 = []
    pipe2 = TrainPipeline(load_config(cfg_for(30, 8)))  # T % 8 != 0 -> fallback
    state2 = pipe2.train(log_fn=logs2.append, resume=False)
    assert int(state2.step) > 0
    assert any("unsupported" in s for s in logs2)


def test_sharded_checkpoint_lifecycle(tmp_path):
    """Save a TrainState while training on a mesh; restore and resume on
    (a) the same mesh and (b) a different device count.  Both resumed
    trajectories must match bit-for-bit-comparable losses — proving
    multi-chip training is actually resumable (round-2 VERDICT item 5).

    The on-disk format is mesh-free (save_checkpoint gathers to host), so
    restore + parallel.replicate works under any device count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvaehmm_tpu import TrainState, make_epoch_step, make_model
    from vqvaehmm_tpu.data.checkpoint import load_checkpoint, save_checkpoint
    from vqvaehmm_tpu.parallel import create_mesh, replicate
    from vqvaehmm_tpu.train.trainer import make_optimizer

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    tx = make_optimizer(1e-3, gradient_clip=1.0)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    S, B, T = 2, 16, 24  # 2 steps/epoch; B divides both 8 and 4
    xs = jnp.asarray(rng.normal(size=(S, B, 5, T)).astype(np.float32))
    us = jnp.asarray(rng.normal(size=(S, B, 4, T)).astype(np.float32))
    lens = jnp.asarray(np.full((S, B), T, np.int32))

    mesh8 = create_mesh(8)
    step8 = make_epoch_step(model, tx, mesh=mesh8, donate=False)
    state = TrainState(replicate(mesh8, params),
                       replicate(mesh8, tx.init(params)),
                       jnp.zeros((), jnp.int32))
    state, _ = step8(state, xs, us, lens, jnp.float32(0.5))

    ck = str(tmp_path / "sharded_ck")
    save_checkpoint(ck, state, metadata={"epoch": 1})

    template = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    # (a) resume on the same 8-device mesh
    restored = load_checkpoint(ck, template)
    st_a = TrainState(replicate(mesh8, restored.params),
                      replicate(mesh8, restored.opt_state),
                      jnp.asarray(restored.step))
    st_a, loss_a = step8(st_a, xs, us, lens, jnp.float32(1.0))

    # (b) resume on a 4-device mesh (different device count, same global
    # batch)
    mesh4 = create_mesh(4)
    step4 = make_epoch_step(model, tx, mesh=mesh4, donate=False)
    restored_b = load_checkpoint(ck, template)
    st_b = TrainState(replicate(mesh4, restored_b.params),
                      replicate(mesh4, restored_b.opt_state),
                      jnp.asarray(restored_b.step))
    st_b, loss_b = step4(st_b, xs, us, lens, jnp.float32(1.0))

    # uninterrupted run on mesh8 = the ground truth trajectory
    st_c, loss_c = step8(state, xs, us, lens, jnp.float32(1.0))

    assert abs(float(loss_a) - float(loss_c)) < 1e-6
    assert abs(float(loss_b) - float(loss_c)) < 1e-5
    assert int(st_a.step) == int(st_c.step) == int(st_b.step)
    for a, c in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-7)
    for b, c in zip(jax.tree_util.tree_leaves(st_b.params),
                    jax.tree_util.tree_leaves(st_c.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)


def test_train_pipeline_device_input(tiny_config):
    """training.input_pipeline="device" routes the pipeline through the
    on-device index-gather path (one dispatch per epoch) and still
    trains, checkpoints, and resumes like the host path."""
    import jax.numpy as jnp  # noqa: F401

    from vqvaehmm_tpu.core.config import apply_overrides, load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    # beta_warmup=false because the trajectory pin below EXTENDS the run
    # (2 epochs, then resume under epochs=3): the default warmup beta
    # min(1, 2(ep+1)/E) depends on the TOTAL epoch count, so epoch 0
    # trains under beta=1.0 when E=2 but beta=2/3 when E=3 — extending
    # a finished run is schedule-identical to the uninterrupted run only
    # when the schedule is independent of E.  Preemption-resume under
    # ONE config (the advertised leaf-exact invariant) keeps warmup and
    # is pinned by test_sigterm_checkpoints_and_resumes[device].
    cfg_path, tmp = tiny_config
    cfg = apply_overrides(load_config(cfg_path),
                          ["training.input_pipeline=device",
                           "training.save_freq=1",
                           "training.beta_warmup=false"])
    logs = []
    state = TrainPipeline(cfg).train(log_fn=logs.append)
    assert int(state.step) == 2 * (32 // 8)
    assert (tmp / "ckpt" / "vae_hmm_trained.npz").exists()
    losses = [float(s.rsplit(" ", 1)[-1]) for s in logs
              if s.startswith("Epoch")]
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)

    # resumes from the periodic checkpoint on the device path too
    cfg3 = apply_overrides(cfg, ["training.epochs=3"])
    logs2 = []
    state2 = TrainPipeline(cfg3).train(log_fn=logs2.append)
    assert any("Resumed" in s for s in logs2)
    assert int(state2.step) == 3 * (32 // 8)

    # trajectory-exact on the device path: the two-process
    # (2-epoch run, then resume-to-3) trajectory must match an
    # uninterrupted 3-epoch run leaf-for-leaf — the resume fast-forward
    # and the index-prefetch must keep the per-epoch draw alignment.
    # (Valid only because beta_warmup=false above makes the schedule
    # independent of the total epoch count; see the fixture comment.)
    import jax

    cfg_solo = apply_overrides(cfg3, [f"training.checkpoint_dir="
                                      f"{tmp / 'ckpt_solo_dev'}"])
    solo = TrainPipeline(cfg_solo).train(log_fn=None, resume=False)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state2.params),
            jax.tree_util.tree_leaves_with_path(solo.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_no_sync_path_matches_logged_path(tiny_config):
    """With log_fn=None (and off save_freq epochs) TrainPipeline keeps
    losses as device scalars to avoid per-epoch host syncs; the final
    checkpoint metadata must still carry the same float history as a
    run that logged (and therefore synced) every epoch."""
    import json as _json

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    raw["training"]["epochs"] = 3
    for tag in ("sync", "nosync"):
        r = dict(raw, training=dict(
            raw["training"], checkpoint_dir=str(tmp / f"ck_{tag}")))
        (tmp / f"cfg_{tag}.json").write_text(_json.dumps(r))

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.checkpoint import load_metadata
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    logs = []
    TrainPipeline(load_config(str(tmp / "cfg_sync.json"))).train(
        log_fn=logs.append, resume=False)
    TrainPipeline(load_config(str(tmp / "cfg_nosync.json"))).train(
        log_fn=None, resume=False)

    m_sync = load_metadata(str(tmp / "ck_sync" / "vae_hmm_trained"))
    m_nosync = load_metadata(str(tmp / "ck_nosync" / "vae_hmm_trained"))
    assert m_sync["final_loss"] == m_nosync["final_loss"]
    # the logged losses are the synced history; the last one must match
    loss_lines = [l for l in logs if "Loss:" in l]
    last_logged = float(loss_lines[-1].rsplit(" ", 1)[-1])
    assert abs(m_nosync["final_loss"] - last_logged) < 1e-3


def test_pipeline_profile_dir_captures_trace(tiny_config, tmp_path):
    """training.profile_dir captures a jax.profiler trace of one
    steady-state epoch (SURVEY.md section 5: tracing as a first-class
    feature); the trace directory must be non-empty afterwards and the
    run itself unaffected."""
    import json as _json

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    prof = str(tmp_path / "trace")
    raw["training"]["profile_dir"] = prof
    raw["training"]["checkpoint_dir"] = str(tmp_path / "ck")
    p = tmp_path / "cfg_prof.json"
    p.write_text(_json.dumps(raw))

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    state = TrainPipeline(load_config(str(p))).train(log_fn=None,
                                                     resume=False)
    assert int(state.step) == 2 * (32 // 8)
    import os

    found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert found, "profiler trace directory is empty"


def test_load_checkpoint_rejects_wrong_config(tmp_path):
    """Restoring a checkpoint into a differently-configured model must
    raise immediately with the mismatched leaf paths — orbax restores
    the on-disk shapes regardless of the template, so without the check
    the failure surfaces much later as an opaque jit shape error."""
    import jax
    import jax.numpy as jnp
    import pytest

    from vqvaehmm_tpu import TrainState, make_model
    from vqvaehmm_tpu.data.checkpoint import (load_checkpoint,
                                              save_checkpoint)
    from vqvaehmm_tpu.train.trainer import make_optimizer

    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    tx = make_optimizer(1e-3)
    p = model.init(jax.random.PRNGKey(0))
    st = TrainState(p, tx.init(p), jnp.zeros((), jnp.int32))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, st)

    wrong = make_model(5, 16, 3, 8, u_dim=4, trans_hidden=16)
    pw = wrong.init(jax.random.PRNGKey(0))
    template = TrainState(pw, tx.init(pw), jnp.zeros((), jnp.int32))
    with pytest.raises(ValueError, match="does not match the template"):
        load_checkpoint(ck, template)

    # the matching template still round-trips
    ok = load_checkpoint(ck, TrainState(p, tx.init(p),
                                        jnp.zeros((), jnp.int32)))
    assert int(ok.step) == 0


def test_pipeline_ensemble_seeds(tiny_config):
    """training.ensemble_seeds trains every seed in one vmapped loop and
    checkpoints the best-final-loss member; metadata records the seeds,
    the winner, and every member's final loss."""
    import json as _json

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    raw["training"]["ensemble_seeds"] = [0, 1, 2]
    raw["training"]["checkpoint_dir"] = str(tmp / "ck_ens")
    p = tmp / "cfg_ens.json"
    p.write_text(_json.dumps(raw))

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.checkpoint import load_metadata
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    state = TrainPipeline(load_config(str(p))).train(log_fn=None)
    assert int(state.step) == 2 * (32 // 8)  # one member's steps
    meta = load_metadata(str(tmp / "ck_ens" / "vae_hmm_trained"))
    assert meta["ensemble_seeds"] == [0, 1, 2]
    assert meta["best_seed"] in (0, 1, 2)
    finals = meta["per_member_final_loss"]
    assert len(finals) == 3
    assert meta["final_loss"] == min(finals)
    assert (tmp / "ck_ens" / "vae_hmm_trained.npz").exists()


def test_gmm_feature_alignment_and_stat_persistence(rng, tmp_path):
    """prepare_regime_features keeps one row per input day (interior
    degenerate windows fill with 0, never drop — dropping misaligned
    every consumer's returns[-len(probs):] pairing), and the detector's
    normalization stats travel with the saved system so a reloaded
    model scores new panels on the TRAINING scale."""
    from vqvaehmm_tpu.models.gmm import prepare_regime_features
    from vqvaehmm_tpu.train.gmm_pipeline import (load_improved_system,
                                                 train_improved_system)

    T, A = 260, 4
    returns = rng.normal(5e-4, 0.01, size=(T, A)).astype(np.float32)
    returns[100:130] = 0.0  # interior degenerate stretch (NaN skew/kurt)
    feats = prepare_regime_features(returns)
    assert feats.shape[0] == T  # full alignment, no dropped rows
    assert np.isfinite(feats).all()

    sys1 = train_improved_system(returns, n_regimes=3, hidden_dim=8,
                                 num_epochs=10, patience=5, log_fn=None)
    assert sys1.detector.feature_mu is not None
    path = str(tmp_path / "sys.npz")
    sys1.save(path)
    sys2 = load_improved_system(path)

    # a DIFFERENT panel scores identically through both (same stats)
    new_returns = rng.normal(0, 0.02, size=(120, A)).astype(np.float32)
    new_feats = prepare_regime_features(new_returns)
    np.testing.assert_allclose(sys1.detector.predict_proba(new_feats),
                               sys2.detector.predict_proba(new_feats),
                               rtol=0, atol=0)

    # unfitted detectors fail loudly
    import pytest

    from vqvaehmm_tpu.models.gmm import SimpleRegimeDetector

    with pytest.raises(ValueError, match="not fitted"):
        SimpleRegimeDetector().predict_proba(new_feats)


@pytest.mark.parametrize("input_pipeline", ["host", "device"])
def test_sigterm_checkpoints_and_resumes(tiny_config, input_pipeline):
    """SIGTERM (preemptible-VM / k8s eviction) checkpoints at the next
    epoch boundary and returns; a rerun auto-resumes and ends with the
    same step count and final checkpoint as an uninterrupted run.

    The device-input variant additionally pins the index-prefetch
    design: when the preempting process dies at the epoch-2 boundary it
    has ALREADY prefetched epoch 3's index draw, and that extra draw
    must die with its rng — the resumed process replays exactly one
    draw per completed epoch, so its epoch 3 sees the same indices the
    uninterrupted run's epoch 3 does (asserted leaf-for-leaf below)."""
    import json as _json
    import os as _os
    import signal as _signal

    import jax

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.checkpoint import load_metadata
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    raw["training"]["epochs"] = 5
    raw["training"]["input_pipeline"] = input_pipeline
    raw["training"]["checkpoint_dir"] = str(tmp / "ckpt_sig")
    p = tmp / "cfg_sig.json"
    p.write_text(_json.dumps(raw))
    cfg = load_config(str(p))

    calls = []

    def preempt_at_2(msg):
        calls.append(msg)
        if msg.startswith("Epoch 2/"):
            _os.kill(_os.getpid(), _signal.SIGTERM)  # handled, sets flag

    pipe = TrainPipeline(cfg)
    state = pipe.train(log_fn=preempt_at_2)
    assert pipe.preempted  # callers must not publish this partial state
    periodic = str(tmp / "ckpt_sig" / "vae_hmm_periodic")
    meta = load_metadata(periodic)
    assert meta is not None and meta["epoch"] == 2 and meta["preempted"]
    assert int(state.step) == 2 * (32 // 8)  # stopped at the boundary
    assert any(m.startswith("SIGTERM") for m in calls)
    # the handler was restored (the default action again)
    assert _signal.getsignal(_signal.SIGTERM) == _signal.SIG_DFL

    # rerun: auto-resume finishes the remaining epochs
    pipe2 = TrainPipeline(cfg)
    state2 = pipe2.train(log_fn=None)
    assert int(state2.step) == 5 * (32 // 8)
    assert not pipe2.preempted  # completed run: flag clear

    # oracle: an uninterrupted run from scratch matches leaf-for-leaf
    raw["training"]["checkpoint_dir"] = str(tmp / "ckpt_solo")
    p2 = tmp / "cfg_solo.json"
    p2.write_text(_json.dumps(raw))
    solo = TrainPipeline(load_config(str(p2))).train(log_fn=None)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state2.params),
            jax.tree_util.tree_leaves_with_path(solo.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping(tiny_config):
    """early_stop_patience halts when the loss stops improving by
    min_delta; the final checkpoint records the truncated run. A huge
    min_delta makes every epoch a non-improvement after the first (inf
    baseline), so the run stops at epoch 1 + patience."""
    import json as _json

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.checkpoint import load_metadata
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    raw["training"].update(epochs=10, early_stop_patience=2,
                           early_stop_min_delta=1e9,
                           checkpoint_dir=str(tmp / "ckpt_es"))
    p = tmp / "cfg_es.json"
    p.write_text(_json.dumps(raw))

    msgs = []
    state = TrainPipeline(load_config(str(p))).train(log_fn=msgs.append)
    nb = 32 // 8
    assert int(state.step) == 3 * nb  # epochs 1 (best) + 2 patience
    assert any(m.startswith("Early stop at epoch 3/10") for m in msgs)
    meta = load_metadata(str(tmp / "ckpt_es" / "vae_hmm_trained"))
    assert meta["early_stopped"] is True and meta["epochs"] == 3


def test_early_stop_counters_survive_preemption(tiny_config):
    """The best-loss/wait counters persist in the checkpoint metadata,
    so a preempted-and-resumed run early-stops at the SAME epoch an
    uninterrupted run would."""
    import json as _json
    import os as _os
    import signal as _signal

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    raw["training"].update(epochs=10, early_stop_patience=3,
                           early_stop_min_delta=1e9,
                           checkpoint_dir=str(tmp / "ckpt_esp"))
    p = tmp / "cfg_esp.json"
    p.write_text(_json.dumps(raw))
    cfg = load_config(str(p))

    def preempt_at_2(msg):
        if msg.startswith("Epoch 2/"):
            _os.kill(_os.getpid(), _signal.SIGTERM)

    pipe = TrainPipeline(cfg)
    pipe.train(log_fn=preempt_at_2)
    assert pipe.preempted

    msgs = []
    state = TrainPipeline(cfg).train(log_fn=msgs.append)
    nb = 32 // 8
    # uninterrupted: best at ep1, wait hits 3 at ep4 -> stop there
    assert int(state.step) == 4 * nb
    assert any(m.startswith("Early stop at epoch 4/10") for m in msgs)


def test_val_split_early_stopping(tiny_config):
    """data.val_fraction holds out the last sequences, logs a per-epoch
    validation ELBO, and early stopping tracks the val metric."""
    import json as _json

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, tmp = tiny_config
    raw = _json.loads(open(cfg_path).read())
    raw["data"]["val_fraction"] = 0.25          # 4 sequences -> 1 held out
    raw["training"].update(epochs=8, early_stop_patience=2,
                           early_stop_min_delta=1e9,
                           checkpoint_dir=str(tmp / "ckpt_val"))
    p = tmp / "cfg_val.json"
    p.write_text(_json.dumps(raw))

    pipe = TrainPipeline(load_config(str(p)))
    ds = pipe.load_data()
    assert len(ds.x_seqs) == 3                   # train split excludes val
    xv, uv, lv = pipe._val_arrays
    assert xv.shape[0] == 1 and uv.shape[0] == 1
    assert xv.shape[2] == min(120, 48) and (lv == xv.shape[2]).all()

    msgs = []
    pipe2 = TrainPipeline(load_config(str(p)))
    state = pipe2.train(log_fn=msgs.append)
    vlogs = [m for m in msgs if m.strip().startswith("ValLoss")]
    assert len(vlogs) == 3                       # one per epoch run
    assert int(state.step) == 3 * (32 // 8)      # stop: 1 best + 2 wait
    assert any(m.startswith("Early stop at epoch 3/8") for m in msgs)


def test_resolve_input_pipeline_auto():
    """'auto' (the config default, round-3 VERDICT item 1) selects the
    measured-fast path per backend: device on TPU, host elsewhere;
    explicit values pass through; typos raise."""
    from vqvaehmm_tpu.train.trainer import resolve_input_pipeline

    assert resolve_input_pipeline("auto", backend="tpu") == "device"
    assert resolve_input_pipeline("auto", backend="cpu") == "host"
    assert resolve_input_pipeline("host", backend="tpu") == "host"
    assert resolve_input_pipeline("device", backend="cpu") == "device"
    # conftest pins the test backend to CPU
    assert resolve_input_pipeline("auto") == "host"
    with pytest.raises(ValueError, match="input_pipeline"):
        resolve_input_pipeline("Device")


def test_resolve_fused_auto():
    """'auto' takes the fused Pallas step exactly when the backend is
    TPU AND the shapes pass the kernel gate; forcing an unsupported
    shape logs and falls back instead of crashing at trace time."""
    from vqvaehmm_tpu.core.config import ModelConfig
    from vqvaehmm_tpu.train.trainer import resolve_fused

    cfg = ModelConfig()
    # the benchmark shape qualifies: TPU-only under auto
    assert resolve_fused("auto", cfg, 64, 200, backend="tpu") is True
    assert resolve_fused("auto", cfg, 64, 200, backend="cpu") is False
    assert resolve_fused(False, cfg, 64, 200, backend="tpu") is False
    # T % 8 != 0 cannot run the kernel
    msgs = []
    assert resolve_fused(True, cfg, 64, 201, log_fn=msgs.append) is False
    assert any("unsupported" in m for m in msgs)
    assert resolve_fused("auto", cfg, 64, 201, backend="tpu") is False
    with pytest.raises(ValueError, match="fused"):
        resolve_fused("yes", cfg, 64, 200)


def test_pipeline_default_is_host_on_cpu(tiny_config, monkeypatch):
    """A default config (input_pipeline/fused 'auto') on the CPU backend
    must take the host/XLA parity path — the device sampler is never
    constructed."""
    import vqvaehmm_tpu.data.device_sampler as ds_mod
    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, _ = tiny_config
    cfg = load_config(cfg_path)
    assert cfg.training.input_pipeline == "auto"
    assert cfg.training.fused == "auto"

    def boom(*a, **k):
        raise AssertionError("device sampler must not be used on CPU auto")

    monkeypatch.setattr(ds_mod.DeviceEpochSampler, "__init__", boom)
    state = TrainPipeline(cfg).train(log_fn=None, resume=False)
    assert int(state.step) == 2 * (32 // 8)
