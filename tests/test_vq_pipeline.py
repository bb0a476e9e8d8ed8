"""First-class VQ family (round-3 VERDICT item 3): config ->
TrainPipeline(model.family=vqvae) -> vq_stack.npz archive -> serving
(HTTP + CLI --stack vq).  The capability the reference only sketched
(reference: pseudocode.txt:1-32) gets the same train/checkpoint/serve
plumbing as the shipped VAE family.
"""

import json
import os
import socket
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu.data.synthetic import synthetic_sequences


@pytest.fixture(scope="module")
def trained_stack(tmp_path_factory):
    """One small trained VQ stack + its archive, shared by the tests."""
    tmp = tmp_path_factory.mktemp("vq")
    xs, us, zs = synthetic_sequences(6, 120, 5, 4, 3, seed=0,
                                     stickiness=0.95)
    np.save(tmp / "x.npy", xs)
    np.save(tmp / "u.npy", us)
    cfg = {
        "model": {"input_dim": 5, "hidden_dim": 16, "K": 3,
                  "hidden_dim2": 8, "u_dim": 4, "trans_hidden": 8,
                  "family": "vqvae"},
        "vq": {"num_codes": 6, "latent_dim": 8, "hmm_iters": 20,
               "hmm_restarts": 2},
        "data": {"x_sequences_path": str(tmp / "x.npy"),
                 "u_sequences_path": str(tmp / "u.npy"),
                 "min_len": 16, "max_len": 48, "samples_per_epoch": 64},
        "training": {"epochs": 8, "lr": 3e-3, "batch_size": 16,
                     "checkpoint_dir": str(tmp / "ckpt"), "seed": 0},
    }
    cfg_path = tmp / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return str(cfg_path), tmp


def test_config_family_validated():
    from vqvaehmm_tpu.core.config import ModelConfig, config_from_dict

    assert ModelConfig().family == "vae"
    assert ModelConfig(family="vqvae").family == "vqvae"
    with pytest.raises(ValueError, match="family"):
        ModelConfig(family="VQVAE")
    cfg = config_from_dict({"model": {"family": "vqvae"},
                            "vq": {"num_codes": 5, "latent_dim": 4}})
    assert cfg.vq.num_codes == 5 and cfg.vq.latent_dim == 4


def test_vq_pipeline_trains_and_archives(trained_stack):
    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline
    from vqvaehmm_tpu.train.vq_pipeline import VQStack

    cfg_path, tmp = trained_stack
    logs = []
    state = TrainPipeline(load_config(cfg_path)).train(log_fn=logs.append)
    assert int(state.step) == 8 * (64 // 16)
    losses = [float(s.rsplit(" ", 1)[-1]) for s in logs
              if s.startswith("Epoch")]
    assert len(losses) == 8 and all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]  # the VQ loss must actually fall

    arch = tmp / "ckpt" / "vq_stack.npz"
    assert arch.exists()

    # round trip: reloaded stack reproduces codes + posteriors exactly
    stack = VQStack.load(str(arch))
    x = jnp.asarray(np.load(tmp / "x.npy")[:2, :, :48])
    codes = np.asarray(stack.codes(x))
    assert codes.shape == (2, 48) and codes.max() < 6
    g = np.asarray(stack.regime_marginals(x))
    assert g.shape == (2, 48, 3)
    np.testing.assert_allclose(g.sum(-1), 1.0, rtol=0, atol=1e-4)
    v = np.asarray(stack.viterbi(x))
    assert v.shape == (2, 48) and v.max() < 3

    stack.save(str(tmp / "resaved.npz"))
    stack2 = VQStack.load(str(tmp / "resaved.npz"))
    np.testing.assert_array_equal(codes, np.asarray(stack2.codes(x)))
    np.testing.assert_array_equal(g, np.asarray(stack2.regime_marginals(x)))


def test_vq_archive_mismatch_raises(trained_stack, tmp_path):
    """Loading an archive against a resized model must fail loudly, not
    serve grafted garbage."""
    from vqvaehmm_tpu.train.vq_pipeline import VQStack

    cfg_path, tmp = trained_stack
    arch = str(tmp / "ckpt" / "vq_stack.npz")
    stack = VQStack.load(arch)
    # corrupt one leaf's shape and re-save raw
    with np.load(arch) as z:
        data = {k: z[k] for k in z.files}
    data["vq_0"] = np.zeros((2, 2), np.float32)
    np.savez(tmp_path / "bad.npz", **data)
    with pytest.raises(ValueError, match="shape|mismatch"):
        VQStack.load(str(tmp_path / "bad.npz"))
    # a gmm archive is not a vq archive
    with pytest.raises(ValueError, match="vq_stack"):
        meta = np.frombuffer(json.dumps({"family": "gmm"}).encode(),
                             np.uint8)
        np.savez(tmp_path / "notvq.npz", meta=meta)
        VQStack.load(str(tmp_path / "notvq.npz"))
    del stack


def test_vq_serving_http(trained_stack):
    """All-surfaces dispatch: a vqvae-family config serves codes +
    regime posteriors over a real socket (stdlib server), with the
    standard 400 on a wrong-C payload and /predict weights."""
    cfg_path, tmp = trained_stack
    inf_cfg = json.load(open(cfg_path))
    inf_cfg["checkpoint_path"] = str(tmp / "ckpt" / "vq_stack.npz")
    inf_path = tmp / "inference_vq.json"
    inf_path.write_text(json.dumps(inf_cfg))

    from vqvaehmm_tpu.serve.httpd import serve

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(str(inf_path), host="127.0.0.1", port=port,
                  background=True)
    base = f"http://127.0.0.1:{port}"
    try:
        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        x = np.random.default_rng(0).normal(size=(5, 37)).tolist()
        status, out = post("/infer", {"x": x})
        assert status == 200
        assert out["mode"] == "smoothed"
        codes = np.array(out["codes"])
        q = np.array(out["regime_probs"])
        assert codes.shape == (37,) and q.shape == (3, 37)
        np.testing.assert_allclose(q.sum(0), 1.0, rtol=0, atol=1e-4)

        status, out_v = post("/infer", {"x": x, "mode": "viterbi"})
        assert status == 200 and len(out_v["states"]) == 37

        status, out_f = post("/infer", {"x": x, "mode": "filtered"})
        assert status == 200 and np.array(
            out_f["regime_probs"]).shape == (3, 37)

        status, _ = post("/infer", {"x": [[0.0] * 10] * 3})
        assert status == 400
        status, _ = post("/stream", {"session": "s", "x_t": [0.0] * 5,
                                     "u_t": [0.0] * 4})
        assert status == 400  # streaming is vae-family only

        status, pred = post("/predict", {"x": x})
        assert status == 200 and "weights" in pred
        w = np.array(pred["weights"])
        assert np.isfinite(w).all()
    finally:
        httpd.shutdown()


def test_vq_cli_report(trained_stack, capsys):
    from vqvaehmm_tpu.serve.cli import main as cli_main

    cfg_path, tmp = trained_stack
    cli_main(["--stack", "vq", "--config", cfg_path,
              "--checkpoint", str(tmp / "ckpt" / "vq_stack.npz")])
    out = capsys.readouterr().out
    assert "Codes" in out and "Current regime" in out


def test_vq_archive_records_codebook_usage(trained_stack):
    """The archive carries the final panel codebook usage (the shipped
    codebook's health is part of the artifact, round-4 VERDICT weak #5);
    save/load round-trips it."""
    from vqvaehmm_tpu.train.vq_pipeline import VQStack

    cfg_path, tmp = trained_stack
    stack = VQStack.load(str(tmp / "ckpt" / "vq_stack.npz"))
    assert stack.usage is not None and len(stack.usage) == 6
    assert abs(sum(stack.usage) - 1.0) < 1e-2  # rounded shares
    stack.save(str(tmp / "resaved_usage.npz"))
    assert VQStack.load(str(tmp / "resaved_usage.npz")).usage == stack.usage


def test_vq_serving_num_codes_mismatch_raises(trained_stack):
    """A config whose vq section disagrees with the archive's codebook
    sizing must fail at startup, not serve the archive while the config
    claims a different code count (round-4 ADVICE)."""
    from vqvaehmm_tpu.serve.vq import VQInferenceModel

    cfg_path, tmp = trained_stack
    inf_cfg = json.load(open(cfg_path))
    inf_cfg["checkpoint_path"] = str(tmp / "ckpt" / "vq_stack.npz")
    inf_cfg["vq"] = dict(inf_cfg["vq"], num_codes=12)
    p = tmp / "inference_vq_badcodes.json"
    p.write_text(json.dumps(inf_cfg))
    with pytest.raises(ValueError, match="num_codes"):
        VQInferenceModel(str(p))


def test_vq_pipeline_sigterm_resume_trajectory_exact(trained_stack,
                                                     tmp_path):
    """The VQ family honours the same preemption contract as the VAE
    family (round-4 ADVICE medium): SIGTERM checkpoints the epoch
    boundary and sets pipeline.preempted (no archive is published from
    the partial state); a rerun auto-resumes — trajectory-exact, since
    the dataset rng is fast-forwarded and the dead-code-restart rng
    state rides the checkpoint — and ends leaf-for-leaf equal to an
    uninterrupted run, archive included."""
    import os as _os
    import signal as _signal

    from vqvaehmm_tpu.core.config import apply_overrides, load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline
    from vqvaehmm_tpu.data.checkpoint import load_metadata

    cfg_path, _ = trained_stack
    cfg = apply_overrides(
        load_config(cfg_path),
        [f"training.checkpoint_dir={tmp_path / 'ck_sig'}",
         "training.save_freq=2", "training.epochs=6"])

    def preempt_at_3(msg):
        if msg.startswith("Epoch 3/"):
            _os.kill(_os.getpid(), _signal.SIGTERM)

    pipe = TrainPipeline(cfg)
    state = pipe.train(log_fn=preempt_at_3)
    assert pipe.preempted
    assert not (tmp_path / "ck_sig" / "vq_stack.npz").exists()
    meta = load_metadata(str(tmp_path / "ck_sig" / "vq_periodic"))
    assert meta is not None and meta["epoch"] == 3 and meta["preempted"]
    assert int(state.step) == 3 * (64 // 16)

    # rerun auto-resumes and completes (archive written this time)
    logs = []
    pipe2 = TrainPipeline(cfg)
    state2 = pipe2.train(log_fn=logs.append)
    assert not pipe2.preempted
    assert any("Resumed from epoch 3" in s for s in logs)
    assert (tmp_path / "ck_sig" / "vq_stack.npz").exists()

    # oracle: uninterrupted run from scratch matches leaf-for-leaf
    cfg_solo = apply_overrides(
        cfg, [f"training.checkpoint_dir={tmp_path / 'ck_solo'}"])
    solo = TrainPipeline(cfg_solo).train(log_fn=None)
    assert int(state2.step) == int(solo.step)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state2.params),
            jax.tree_util.tree_leaves_with_path(solo.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vq_codebook_lr_scale():
    """vq.codebook_lr_scale scales the codebook's post-optimizer UPDATE
    (a per-leaf learning rate): scale=0 freezes the codebook while the
    rest of the model trains, and after a single step from identical
    init the scale=2 codebook step is exactly 2x the scale=1 step.  The
    knob must act post-Adam — Adam normalizes each parameter's step by
    its own gradient scale, so a pre-optimizer gradient multiplier
    cancels to eps-level noise (the bug this test pins against)."""
    import optax

    from vqvaehmm_tpu.models.vqvae_hmm import VQVAEConfig, VQVAEHMM
    from vqvaehmm_tpu.train.trainer import TrainState
    from vqvaehmm_tpu.train.vq_pipeline import make_vq_epoch_step

    model = VQVAEHMM(VQVAEConfig(input_dim=5, hidden_dim=8, hidden_dim2=4,
                                 num_codes=4, latent_dim=4))
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(2, 8, 5, 16)).astype(np.float32))
    lens = jnp.full((2, 8), 16, jnp.int32)
    # one-batch epoch for the exact-2x relation (after the first step
    # the trajectories diverge and the relation is no longer linear)
    xs1, lens1 = xs[:1], lens[:1]

    def run(scale, xs_, lens_):
        step = make_vq_epoch_step(model, tx, donate=False,
                                  codebook_lr_scale=scale)
        st = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        st, _, _ = step(st, xs_, lens_)
        return st.params

    frozen = run(0.0, xs, lens)
    np.testing.assert_array_equal(np.asarray(frozen["codebook"]),
                                  np.asarray(params["codebook"]))
    # the encoder still moved
    assert not np.array_equal(
        np.asarray(frozen["encoder"]["conv1"]["weight"]),
        np.asarray(params["encoder"]["conv1"]["weight"]))
    # after ONE step, the scale=2 codebook update is exactly double the
    # scale=1 update (and therefore far outside eps-level noise)
    cb0 = np.asarray(params["codebook"], np.float64)
    d1 = np.asarray(run(1.0, xs1, lens1)["codebook"], np.float64) - cb0
    d2 = np.asarray(run(2.0, xs1, lens1)["codebook"], np.float64) - cb0
    assert np.abs(d1).max() > 0
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-4, atol=1e-7)


def test_vq_rerun_of_completed_command_republishes_same_archive(
        trained_stack, tmp_path):
    """Re-running a completed VQ training command (resume default,
    periodic checkpointing on) republishes a bit-identical archive.
    The config forces the final-polish path (dead_code_min_usage above
    a uniform share, so some code is always below the shipping
    threshold), pinning the historical failure: a rerun used to resume
    from the PRE-polish periodic checkpoint, skip the polish (no epoch
    counts), and overwrite vq_stack.npz with different, unpolished
    params.  The post-polish checkpoint (metadata `polished`) plus the
    panel-usage polish criterion make the rerun idempotent."""
    from vqvaehmm_tpu.core.config import apply_overrides, load_config
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    cfg_path, _ = trained_stack
    cfg = apply_overrides(
        load_config(cfg_path),
        [f"training.checkpoint_dir={tmp_path / 'ck_rerun'}",
         "training.save_freq=2", "training.epochs=4",
         "vq.dead_code_min_usage=2.0", "vq.final_polish_epochs=1"])
    logs1 = []
    TrainPipeline(cfg).train(log_fn=logs1.append)
    assert any("final polish" in s for s in logs1)  # polish really ran
    ar = tmp_path / "ck_rerun" / "vq_stack.npz"

    def arrays(path):
        with np.load(path) as z:
            return {k: z[k].copy() for k in z.files}

    a1 = arrays(ar)
    logs2 = []
    pipe2 = TrainPipeline(cfg)
    pipe2.train(log_fn=logs2.append)
    assert not pipe2.preempted
    assert not any("final polish" in s for s in logs2)  # skipped: done
    a2 = arrays(ar)
    assert set(a1) == set(a2)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k], err_msg=k)


def test_vq_requires_checkpoint_env(trained_stack, monkeypatch):
    """VQHMM_REQUIRE_CHECKPOINT=1 fails a vq serving build with a
    missing archive instead of warning (production parity with the VAE
    surface)."""
    cfg_path, tmp = trained_stack
    inf_cfg = json.load(open(cfg_path))
    inf_cfg["checkpoint_path"] = str(tmp / "missing_archive")
    p = tmp / "inference_vq_missing.json"
    p.write_text(json.dumps(inf_cfg))
    monkeypatch.setenv("VQHMM_REQUIRE_CHECKPOINT", "1")
    from vqvaehmm_tpu.serve.vq import VQInferenceModel

    with pytest.raises(FileNotFoundError):
        VQInferenceModel(str(p))
