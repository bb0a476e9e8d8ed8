"""Trainer tests: learning happens, epoch-fusion is exact, and the
data-parallel mesh path reproduces single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvaehmm_tpu import (RandomChunkDataset, TrainState, beta_schedule,
                          make_epoch_step, make_model, make_train_step,
                          train_model)
from vqvaehmm_tpu.data.synthetic import synthetic_sequences
from vqvaehmm_tpu.parallel import create_mesh
from vqvaehmm_tpu.train.trainer import make_optimizer


def _dataset(seed=0, n=6, T=96):
    xs, us, _ = synthetic_sequences(n, T, 5, 4, 3, seed=seed)
    return RandomChunkDataset(xs, us, min_len=16, max_len=48,
                              samples_per_epoch=64, seed=seed)


def test_beta_schedule_matches_reference():
    # beta = min(1, 2(ep+1)/E)  (reference :151)
    assert beta_schedule(0, 10) == 0.2
    assert beta_schedule(4, 10) == 1.0
    assert beta_schedule(9, 10) == 1.0
    assert beta_schedule(3, 10, warmup=False) == 1.0


def test_training_reduces_loss():
    model = make_model(5, 16, 3, 8, u_dim=4, trans_hidden=16)
    ds = _dataset()
    state, hist = train_model(model, ds, num_epochs=8, lr=3e-3,
                              batch_size=16, log_fn=None, seed=0)
    # beta anneals up over the first half; compare the final stretch where
    # beta is constant at 1.0
    assert hist[-1] < hist[4]
    assert int(state.step) == 8 * (64 // 16)


def test_epoch_scan_equals_stepwise():
    """One fused lax.scan epoch must produce bitwise-comparable results to
    stepping batch by batch."""
    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))
    s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    N, B, T = 3, 4, 32
    xs = rng.normal(size=(N, B, 5, T)).astype(np.float32)
    us = rng.normal(size=(N, B, 4, T)).astype(np.float32)
    lens = rng.integers(10, T + 1, size=(N, B)).astype(np.int32)

    epoch_step = make_epoch_step(model, tx, donate=False)
    s_scan, _ = epoch_step(s0, xs, us, lens, jnp.float32(0.8))

    step = make_train_step(model, tx, donate=False)
    s_loop = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    for i in range(N):
        s_loop, _ = step(s_loop, xs[i], us[i], lens[i], jnp.float32(0.8))

    a = jax.tree_util.tree_leaves(s_scan.params)
    b = jax.tree_util.tree_leaves(s_loop.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_mesh_step_matches_single_device():
    """Sharding the batch over 8 virtual devices must match the unsharded
    update (the psum mean-gradient is mathematically identical)."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    B, T = 16, 32
    x = rng.normal(size=(B, 5, T)).astype(np.float32)
    u = rng.normal(size=(B, 4, T)).astype(np.float32)
    lens = rng.integers(10, T + 1, size=B).astype(np.int32)

    s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    single = make_train_step(model, tx, donate=False)
    s1, loss1 = single(s0, x, u, lens, jnp.float32(1.0))

    mesh = create_mesh(8)
    sharded = make_train_step(model, tx, mesh=mesh, donate=False)
    s0m = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s2, loss2 = sharded(s0m, x, u, lens, jnp.float32(1.0))

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dataset_chunk_bounds():
    ds = _dataset()
    for i in range(10):
        x, u, L = ds[i]
        assert 16 <= L <= 48
        assert x.shape == (5, L)
        assert u.shape == (4, L)


def test_trainer_class_api():
    """Object-style Trainer mirrors the reference Trainer surface."""
    from vqvaehmm_tpu.train.trainer import Trainer

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tr = Trainer(model, lr=1e-3, gradient_clip=1.0, seed=0)
    ds = _dataset()
    hist = tr.train(ds, num_epochs=2, batch_size=16, log_fn=None)
    assert len(hist) == 2
    assert all(np.isfinite(h) for h in hist)
    assert int(tr.state.step) == 2 * (64 // 16)


def test_trainer_device_data_flag():
    """Trainer mirrors train_model's device_data control: True forces the
    device input pipeline (index triples + on-chip gather) on any
    backend; False forces host-assembled epochs even on TPU (so a
    host-path trajectory stays reproducible on-chip)."""
    from vqvaehmm_tpu.train.trainer import Trainer

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    ds = _dataset()
    tr_dev = Trainer(model, lr=1e-3, seed=0, device_data=True)
    hist = tr_dev.train(ds, num_epochs=2, batch_size=16, log_fn=None)
    assert len(hist) == 2 and all(np.isfinite(h) for h in hist)
    assert hasattr(tr_dev, "_sampler")  # took the device pipeline

    # device_data=False: identical trajectory to the default host path
    # on CPU (same seed -> same epoch_arrays stream)
    tr_host = Trainer(model, lr=1e-3, seed=0, device_data=False)
    tr_ref = Trainer(model, lr=1e-3, seed=0)
    h1 = tr_host.train(_dataset(), num_epochs=2, batch_size=16,
                       log_fn=None)
    h2 = tr_ref.train(_dataset(), num_epochs=2, batch_size=16,
                      log_fn=None)
    np.testing.assert_allclose(h1, h2, rtol=0, atol=0)
    assert not hasattr(tr_host, "_sampler")


def test_prefetch_epochs_yields_all():
    from vqvaehmm_tpu.data.prefetch import prefetch_epochs

    ds = _dataset()
    epochs = list(prefetch_epochs(ds, batch_size=16, num_epochs=3))
    assert len(epochs) == 3
    for xs, us, lens in epochs:
        assert xs.shape == (4, 16, 5, 48)
        assert lens.shape == (4, 16)


def test_prefetch_early_stop_releases_producer():
    """Closing the consumer early must not leave the producer thread
    blocked forever on a full queue (it holds device arrays)."""
    import threading
    import time

    from vqvaehmm_tpu.data.prefetch import prefetch_epochs

    before = {t.ident for t in threading.enumerate()}
    gen = prefetch_epochs(_dataset(), batch_size=16, num_epochs=50,
                          buffer_size=1)
    next(gen)
    gen.close()  # consumer stops after 1 of 50 epochs
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"


def test_prefetch_producer_error_propagates():
    """A producer crash must surface in the consumer, not end the stream
    cleanly (silent truncation = training 'succeeds' with fewer
    epochs)."""
    import pytest

    from vqvaehmm_tpu.data.prefetch import prefetch_epochs

    ds = _dataset()
    ds.x_seqs = None  # poison: epoch_arrays will raise on first access
    with pytest.raises(Exception):
        list(prefetch_epochs(ds, batch_size=16, num_epochs=2))


def test_mesh_epoch_scan_matches_single_device():
    """The epoch-fused scan under the 8-device mesh must match the
    unsharded epoch scan (this is the path train_model(mesh=...) uses)."""
    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(2)
    N, B, T = 2, 16, 24
    xs = rng.normal(size=(N, B, 5, T)).astype(np.float32)
    us = rng.normal(size=(N, B, 4, T)).astype(np.float32)
    lens = rng.integers(10, T + 1, size=(N, B)).astype(np.int32)

    s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    single = make_epoch_step(model, tx, donate=False)
    s1, loss1 = single(s0, xs, us, lens, jnp.float32(0.9))

    mesh = create_mesh(8)
    sharded = make_epoch_step(model, tx, mesh=mesh, donate=False)
    s0m = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s2, loss2 = sharded(s0m, xs, us, lens, jnp.float32(0.9))

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_epoch_numerics_at_full_per_device_batch():
    """Sharded-path numerics guard at the benchmark per-device batch:
    B = 8 devices x 64/device = 512 must reproduce the unsharded update
    (VERDICT r1 #10)."""
    model = make_model(5, 8, 3, 4, u_dim=4, trans_hidden=8)
    tx = make_optimizer(1e-3)
    params = model.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(7)
    N, B, T = 1, 512, 24
    xs = rng.normal(size=(N, B, 5, T)).astype(np.float32)
    us = rng.normal(size=(N, B, 4, T)).astype(np.float32)
    lens = rng.integers(10, T + 1, size=(N, B)).astype(np.int32)

    s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    single = make_epoch_step(model, tx, donate=False)
    s1, loss1 = single(s0, xs, us, lens, jnp.float32(1.0))

    mesh = create_mesh(8)
    sharded = make_epoch_step(model, tx, mesh=mesh, donate=False)
    s0m = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s2, loss2 = sharded(s0m, xs, us, lens, jnp.float32(1.0))

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_optimizer_trajectory_matches_torch_oracle():
    """N-step Adam + global-norm-clip + beta-schedule trajectory against a
    functional-torch implementation of the reference update
    (VQ_VAE_HMM_fixed.py:145-162 loss/Adam + src/training/trainer.py:31
    clip).  Same init, same batches; per-step losses must agree to <=1e-4
    so a subtle optax-vs-torch divergence cannot hide until a full run."""
    import math

    import torch
    import torch.nn.functional as F

    from vqvaehmm_tpu.utils.torch_interop import vae_hmm_params_to_state_dict

    C, H, K, H2, U, TH = 5, 8, 3, 4, 2, 8
    B, T = 4, 16
    LR, CLIP, EPOCHS, BATCHES = 1e-3, 1.0, 8, 3

    model = make_model(C, H, K, H2, u_dim=U, trans_hidden=TH)
    params = model.init(jax.random.PRNGKey(3))
    tx = make_optimizer(LR, gradient_clip=CLIP)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, donate=False)

    # torch mirror: identical init via the state_dict export
    sd = vae_hmm_params_to_state_dict(params)
    tp = {k: torch.from_numpy(np.array(v)).requires_grad_()
          for k, v in sd.items()}
    opt = torch.optim.Adam(tp.values(), lr=LR)

    def torch_loss(x, u, lengths, beta):
        mask = torch.arange(T)[None, :] < lengths[:, None]
        ut = u.permute(0, 2, 1).reshape(B * T, U)
        h = F.relu(F.linear(ut, tp["prior.transition_net.0.weight"],
                            tp["prior.transition_net.0.bias"]))
        log_A = F.log_softmax(
            F.linear(h, tp["prior.transition_net.2.weight"],
                     tp["prior.transition_net.2.bias"]).view(B, T, K, K),
            dim=-1)
        log_pi = F.log_softmax(tp["prior.log_prior"], dim=-1)
        h = F.relu(F.conv1d(x, tp["encoder.conv1.weight"],
                            tp["encoder.conv1.bias"], padding=1))
        h = F.relu(F.conv1d(h, tp["encoder.conv2.weight"],
                            tp["encoder.conv2.bias"], padding=1))
        logits = F.conv1d(h, tp["encoder.to_logits.weight"],
                          tp["encoder.to_logits.bias"])
        q = F.softmax(logits, dim=1)
        e = torch.matmul(q.permute(0, 2, 1),
                         tp["decoder.embeddings.weight"]).permute(0, 2, 1)
        h = F.relu(F.conv1d(e, tp["decoder.conv1.weight"],
                            tp["decoder.conv1.bias"], padding=1))
        h = F.relu(F.conv1d(h, tp["decoder.conv2.weight"],
                            tp["decoder.conv2.bias"], padding=1))
        out = F.conv1d(h, tp["decoder.to_params.weight"],
                       tp["decoder.to_params.bias"])
        mu, logvar = out[:, :C], out[:, C:]
        var = logvar.exp().clamp(min=1e-8)
        nll = 0.5 * (torch.log(2 * math.pi * var) + (mu - x) ** 2 / var)
        recon = (nll * mask.unsqueeze(1).float()).sum() / \
            (mask.sum() * C).clamp(min=1.0)
        init_t = (q[:, :, 0] * log_pi.unsqueeze(0)).sum(1)
        qp = q[:, :, :-1].permute(0, 2, 1).unsqueeze(-1)
        qn = q[:, :, 1:].permute(0, 2, 1).unsqueeze(-2)
        trans = (qp * qn * log_A[:, 1:]).sum(dim=(2, 3))
        tm = (mask[:, 1:] & mask[:, :-1]).float()
        prior_l = -(init_t + (trans * tm).sum(1)).mean()
        ent = -(q * F.log_softmax(logits, dim=1)).sum(1)
        ent = (ent * mask.float()).sum() / B
        return recon + beta * (prior_l - ent)

    rng = np.random.default_rng(11)
    jl, tl = [], []
    for ep in range(EPOCHS):
        beta = beta_schedule(ep, EPOCHS)
        for _ in range(BATCHES):
            x = rng.normal(size=(B, C, T)).astype(np.float32)
            u = rng.normal(size=(B, U, T)).astype(np.float32)
            lengths = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
            lengths[0] = T

            state, loss = step(state, jnp.asarray(x), jnp.asarray(u),
                               jnp.asarray(lengths), jnp.float32(beta))
            jl.append(float(loss))

            opt.zero_grad()
            tloss = torch_loss(torch.from_numpy(x), torch.from_numpy(u),
                               torch.from_numpy(lengths.astype(np.int64)),
                               beta)
            tloss.backward()
            torch.nn.utils.clip_grad_norm_(tp.values(), CLIP)
            opt.step()
            tl.append(float(tloss.detach()))

    jl, tl = np.asarray(jl), np.asarray(tl)
    np.testing.assert_allclose(jl, tl, atol=1e-4, rtol=1e-4)

    # the trajectories must also land on the same parameters
    sd_end = vae_hmm_params_to_state_dict(state.params)
    for k, v in sd_end.items():
        np.testing.assert_allclose(
            v, tp[k].detach().numpy(), atol=2e-4, rtol=1e-3,
            err_msg=f"param divergence at {k}")


def test_train_model_device_data_path():
    """train_model(device_data=True) — the TPU-default feeding path —
    must train (loss falls) and produce the same loss SCALE as the host
    path (same distribution; the stream differs by design, as the
    native C sampler's already does)."""
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences

    xs, us, _ = synthetic_sequences(5, 120, seed=0)
    ds = RandomChunkDataset(xs, us, min_len=16, max_len=48,
                            samples_per_epoch=64, seed=0)
    model = make_model(5, 16, 3, 8, u_dim=4, trans_hidden=16)
    state, hist = train_model(model, ds, num_epochs=6, lr=2e-3,
                              batch_size=16, device_data=True,
                              fused=True, log_fn=None)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_train_ensemble_members_match_solo_runs():
    """Vmapped multi-seed ensemble training: every member's trajectory
    must equal a solo train_model run from the same seed over the same
    epoch stream (the member axis only batches independent math), and
    `best` must index the lowest final loss."""
    from vqvaehmm_tpu.train import (ensemble_member, train_ensemble,
                                    train_model)

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    seeds = [0, 1, 2]
    states, hist, best = train_ensemble(
        model, _dataset(), seeds, num_epochs=3, batch_size=16,
        log_fn=None)
    assert hist.shape == (3, 3)
    assert best == int(hist[:, -1].argmin())

    for i, s in enumerate(seeds):
        # fresh dataset with the same seed -> identical epoch stream
        st, solo_hist = train_model(model, _dataset(), num_epochs=3,
                                    batch_size=16, seed=s, log_fn=None,
                                    device_data=False)
        np.testing.assert_allclose(hist[i], solo_hist, rtol=0,
                                   atol=1e-6)
        member = ensemble_member(states, i)
        assert int(member.step) == int(st.step)
        for a, b in zip(jax.tree_util.tree_leaves(member.params),
                        jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-6)


def test_ensemble_fused_step_matches_solo_fused():
    """fused=True ensemble (lax.map over members, each running the
    Pallas loss+grads kernel) must reproduce each member's solo fused
    epoch — the on-chip-preferred configuration (vmapping the XLA
    update over members measured SUPER-linear, BENCH_NOTES "Ensemble
    member-axis marginal")."""
    from vqvaehmm_tpu.train.ensemble import (ensemble_member,
                                             init_ensemble_state,
                                             make_ensemble_epoch_step)
    from vqvaehmm_tpu.train.trainer import (make_epoch_step,
                                            make_optimizer)

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tx = make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    nb, B, T = 2, 16, 16  # T % 8 == 0 and a lane-legal block exist
    xs = rng.normal(size=(nb, B, 5, T)).astype(np.float32)
    us = rng.normal(size=(nb, B, 4, T)).astype(np.float32)
    lens = rng.integers(8, T + 1, size=(nb, B)).astype(np.int32)

    states = init_ensemble_state(model, tx, [0, 1])
    step = make_ensemble_epoch_step(model, tx, donate=False, fused=True)
    out, losses = step(states, xs, us, lens, jnp.float32(0.7))

    solo = make_epoch_step(model, tx, donate=False, fused=True)
    for i in range(2):
        st, loss = solo(ensemble_member(states, i), xs, us, lens,
                        jnp.float32(0.7))
        np.testing.assert_allclose(np.asarray(losses[i]),
                                   np.asarray(loss), rtol=0, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(
                            ensemble_member(out, i).params),
                        jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-6)


def test_ensemble_mesh_sharded_matches_single_device():
    """Ensemble parallelism: sharding the member axis over an 8-device
    mesh must reproduce the single-device vmapped trajectories exactly
    (members are independent; XLA partitions the vmap with zero
    collectives)."""
    from vqvaehmm_tpu.parallel import create_mesh
    from vqvaehmm_tpu.train.ensemble import (init_ensemble_state,
                                             make_ensemble_epoch_step)
    from vqvaehmm_tpu.train.trainer import make_optimizer
    from vqvaehmm_tpu.data.dataset import epoch_arrays

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tx = make_optimizer(1e-3)
    seeds = list(range(8))

    mesh = create_mesh(8)
    xs, us, lens = epoch_arrays(_dataset(), 16)

    st_solo = init_ensemble_state(model, tx, seeds)
    step_solo = make_ensemble_epoch_step(model, tx, donate=False)
    st_solo, l_solo = step_solo(st_solo, xs, us, lens,
                                jnp.float32(1.0))

    st_mesh = init_ensemble_state(model, tx, seeds)
    step_mesh = make_ensemble_epoch_step(model, tx, donate=False,
                                         mesh=mesh)
    st_mesh, l_mesh = step_mesh(st_mesh, xs, us, lens,
                                jnp.float32(1.0))

    # batched (8-member) vs per-shard (1-member) conv kernels fuse
    # differently on CPU — ~2e-6 float jitter, well inside the repo's
    # 1e-4 parity bar
    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_solo),
                               rtol=0, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_mesh.params),
                    jax.tree_util.tree_leaves(st_solo.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_ensemble_mesh_sharded_fused_matches_unsharded():
    """fused=True combined with a member-sharded mesh (lax.map over the
    LOCAL members inside shard_map, each through the Pallas loss+grads
    kernel) must reproduce the unsharded fused ensemble exactly —
    member-sharded fused training needs trajectory coverage of its own
    (round-3 advisor finding)."""
    from vqvaehmm_tpu.parallel import create_mesh
    from vqvaehmm_tpu.train.ensemble import (init_ensemble_state,
                                             make_ensemble_epoch_step)
    from vqvaehmm_tpu.train.trainer import make_optimizer

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    tx = make_optimizer(1e-3)
    seeds = list(range(8))
    rng = np.random.default_rng(1)
    nb, B, T = 2, 16, 16  # T % 8 == 0 and a lane-legal block exist
    xs = rng.normal(size=(nb, B, 5, T)).astype(np.float32)
    us = rng.normal(size=(nb, B, 4, T)).astype(np.float32)
    lens = rng.integers(8, T + 1, size=(nb, B)).astype(np.int32)

    st_solo = init_ensemble_state(model, tx, seeds)
    step_solo = make_ensemble_epoch_step(model, tx, donate=False,
                                         fused=True)
    st_solo, l_solo = step_solo(st_solo, xs, us, lens, jnp.float32(0.7))

    mesh = create_mesh(8)
    st_mesh = init_ensemble_state(model, tx, seeds)
    step_mesh = make_ensemble_epoch_step(model, tx, donate=False,
                                         fused=True, mesh=mesh)
    st_mesh, l_mesh = step_mesh(st_mesh, xs, us, lens, jnp.float32(0.7))

    # per-member kernels are identical computations; only the lax.map
    # grouping differs (8 sequential vs 8x1 sharded) — exact match
    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_solo),
                               rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_mesh.params),
                    jax.tree_util.tree_leaves(st_solo.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_train_ensemble_fused_gate_falls_back():
    """train_ensemble(fused=True) at kernel-unsupported shapes must log
    and take the XLA path instead of dying in a trace-time ValueError
    (round-3 advisor finding: direct callers like scripts/ensemble_eval
    previously bypassed the pipeline's gate)."""
    from vqvaehmm_tpu.train import train_ensemble

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    # max_len=50: T % 8 != 0, so the kernel gate rejects outright
    xs, us, _ = synthetic_sequences(6, 96, 5, 4, 3, seed=0)
    ds = RandomChunkDataset(xs, us, min_len=16, max_len=50,
                            samples_per_epoch=32, seed=0)
    msgs = []
    states, hist, best = train_ensemble(
        model, ds, [0, 1], num_epochs=1, lr=1e-3, batch_size=16,
        device_data=False, fused=True, log_fn=msgs.append)
    assert any("unsupported" in m for m in msgs)
    assert hist.shape == (2, 1) and np.isfinite(hist).all()


def test_train_ensemble_device_data_path():
    """train_ensemble's device input path (auto on TPU; forced here)
    assembles epochs in device memory via the sampler gather and still
    trains every member to finite losses."""
    from vqvaehmm_tpu.train import train_ensemble

    model = make_model(5, 12, 3, 6, u_dim=4, trans_hidden=12)
    states, hist, best = train_ensemble(
        model, _dataset(), seeds=[0, 1], num_epochs=2, batch_size=16,
        device_data=True, log_fn=None)
    assert hist.shape == (2, 2) and np.isfinite(hist).all()
    assert 0 <= best < 2


def test_make_lr_schedule_values():
    """Schedule composition: the parity default is the plain float (so
    optax.adam(lr) is bit-identical to the reference config); warmup
    ramps 0 -> lr; cosine/linear decay to final_lr_frac * lr at the
    horizon."""
    from vqvaehmm_tpu.train.trainer import make_lr_schedule

    assert make_lr_schedule(1e-3) == 1e-3  # plain float, not a callable

    s = make_lr_schedule(1e-3, "cosine", warmup_steps=10,
                         total_steps=110, final_lr_frac=0.1)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(110)), 1e-4, rtol=1e-5)
    mid = float(s(60))
    assert 1e-4 < mid < 1e-3  # strictly between peak and floor

    lin = make_lr_schedule(1e-3, "linear", total_steps=100)
    np.testing.assert_allclose(float(lin(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(100)), 0.0, atol=1e-12)

    with pytest.raises(ValueError, match="total_steps"):
        make_lr_schedule(1e-3, "cosine")
    with pytest.raises(ValueError, match="unknown"):
        make_lr_schedule(1e-3, "polynomial")


def test_lr_schedule_through_pipeline(tmp_path):
    """The schedule knobs reach the optimizer through TrainPipeline: a
    warmup run's first update is smaller than the constant-lr run's, and
    the two trajectories diverge."""
    import json

    from vqvaehmm_tpu.core.config import load_config
    from vqvaehmm_tpu.data.synthetic import synthetic_sequences
    from vqvaehmm_tpu.train.pipeline import TrainPipeline

    xs, us, _ = synthetic_sequences(4, 120, 5, 4, 3, seed=0)
    np.save(tmp_path / "x.npy", xs)
    np.save(tmp_path / "u.npy", us)
    cfg = {"model": {"input_dim": 5, "hidden_dim": 8, "K": 3,
                     "hidden_dim2": 4, "u_dim": 4, "trans_hidden": 8},
           "data": {"x_sequences_path": str(tmp_path / "x.npy"),
                    "u_sequences_path": str(tmp_path / "u.npy"),
                    "min_len": 16, "max_len": 48,
                    "samples_per_epoch": 16},
           "training": {"epochs": 2, "lr": 1e-3, "batch_size": 8,
                        "checkpoint_dir": str(tmp_path / "c1"),
                        "seed": 1}}
    p1 = tmp_path / "c1.json"
    p1.write_text(json.dumps(cfg))
    cfg["training"]["checkpoint_dir"] = str(tmp_path / "c2")
    cfg["training"]["lr_schedule"] = "cosine"
    cfg["training"]["warmup_steps"] = 3
    cfg["training"]["final_lr_frac"] = 0.1
    p2 = tmp_path / "c2.json"
    p2.write_text(json.dumps(cfg))

    s_const = TrainPipeline(load_config(str(p1))).train(log_fn=None)
    s_sched = TrainPipeline(load_config(str(p2))).train(log_fn=None)
    a = np.concatenate([np.ravel(v) for v in
                        jax.tree_util.tree_leaves(s_const.params)])
    b = np.concatenate([np.ravel(v) for v in
                        jax.tree_util.tree_leaves(s_sched.params)])
    assert np.abs(a - b).max() > 1e-6  # the schedule changed the run
