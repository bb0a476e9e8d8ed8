"""Advanced training strategies: MAML meta-learning, online EMA learning,
walk-forward retraining (reference: training.py:8-123).

JAX renders each strategy as composition instead of mutation:
* MAML inner loops are jax.grad through jax.grad (the reference's
  create_graph=True, training.py:23) over functional params.
* EMA shadow params are an optax-style pytree average, not .data writes.
* Walk-forward is plain orchestration over jitted steps.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import optax

from ..losses.portfolio import sharpe_loss


class MetaPortfolioOptimizer:
    """MAML-style meta-learning for fast adaptation
    (reference: training.py:8-46)."""

    def __init__(self, model, params, inner_lr: float = 0.01,
                 outer_lr: float = 0.001, n_inner: int = 5):
        self.model = model
        self.params = params
        self.inner_lr = inner_lr
        self.n_inner = n_inner
        self.meta_opt = optax.adam(outer_lr)
        self.opt_state = self.meta_opt.init(params)

        def adapt(params, support, loss_fn):
            """n_inner differentiable SGD steps on the support set."""
            q, rets = support

            def one(p, _):
                g = jax.grad(lambda pp: loss_fn(self.model(pp, q), rets))(p)
                p = jax.tree_util.tree_map(
                    lambda a, b: a - self.inner_lr * b, p, g)
                return p, None

            adapted, _ = jax.lax.scan(one, params, None, length=self.n_inner)
            return adapted

        def meta_loss(params, tasks, loss_fn):
            total = 0.0
            for support, query in tasks:
                adapted = adapt(params, support, loss_fn)
                q, rets = query
                total = total + loss_fn(self.model(adapted, q), rets)
            return total

        def meta_step(params, opt_state, tasks, loss_fn):
            loss, grads = jax.value_and_grad(meta_loss)(params, tasks,
                                                        loss_fn)
            updates, opt_state = self.meta_opt.update(grads, opt_state,
                                                      params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._adapt = adapt
        # the whole meta step (grad + Adam + apply) is one jitted call —
        # eager optax tree ops would pay one device dispatch per leaf op
        self._meta_step = jax.jit(meta_step, static_argnames="loss_fn")

    def adapt(self, support_data, loss_fn) -> Dict:
        """Return task-adapted parameters (reference: training.py:15-27)."""
        support = tuple(jnp.asarray(a) for a in support_data)
        return self._adapt(self.params, support, loss_fn)

    def meta_update(self, tasks, loss_fn) -> float:
        """Second-order meta step over a task batch
        (reference: training.py:29-46)."""
        tasks = [tuple(tuple(jnp.asarray(a) for a in split)
                       for split in task) for task in tasks]
        self.params, self.opt_state, loss = self._meta_step(
            self.params, self.opt_state, tasks, loss_fn)
        return float(loss)


class OnlinePortfolioOptimizer:
    """Per-step Adam + EMA shadow params (reference: training.py:49-74)."""

    def __init__(self, model, params, lr: float = 0.001,
                 ema_decay: float = 0.99, gradient_clip: float = 1.0):
        self.model = model
        self.params = params
        self.ema_decay = ema_decay
        self.tx = optax.chain(optax.clip_by_global_norm(gradient_clip),
                              optax.adam(lr))
        self.opt_state = self.tx.init(params)
        self.ema_params = jax.tree_util.tree_map(jnp.copy, params)

        @jax.jit
        def _step(params, opt_state, ema, q, rets):
            def _loss(p):
                # custom losses route through _make_custom_step (a
                # callable cannot be a traced jit argument)
                return sharpe_loss(self.model(p, q), rets)

            loss, grads = jax.value_and_grad(_loss)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: self.ema_decay * e + (1 - self.ema_decay) * p,
                ema, params)
            return params, opt_state, ema, loss

        self._step = _step

    def update(self, regime_probs, returns, loss_fn=None) -> float:
        q = jnp.asarray(regime_probs)
        rets = jnp.asarray(returns)
        if loss_fn is not None:
            step = self._make_custom_step(loss_fn)
            self.params, self.opt_state, self.ema_params, loss = step(
                self.params, self.opt_state, self.ema_params, q, rets)
        else:
            self.params, self.opt_state, self.ema_params, loss = self._step(
                self.params, self.opt_state, self.ema_params, q, rets)
        return float(loss)

    def _make_custom_step(self, loss_fn):
        if not hasattr(self, "_custom_steps"):
            self._custom_steps = {}
        if loss_fn not in self._custom_steps:
            @jax.jit
            def step(params, opt_state, ema, q, rets):
                def _loss(p):
                    return loss_fn(self.model(p, q), rets)

                loss, grads = jax.value_and_grad(_loss)(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                ema = jax.tree_util.tree_map(
                    lambda e, p: self.ema_decay * e
                    + (1 - self.ema_decay) * p, ema, params)
                return params, opt_state, ema, loss

            self._custom_steps[loss_fn] = step
        return self._custom_steps[loss_fn]

    def use_ema(self):
        """Swap live params for the EMA shadow (reference: training.py:72-74)."""
        self.params = jax.tree_util.tree_map(jnp.copy, self.ema_params)


class WalkForwardTrainer:
    """Rolling train/test windows with periodic retraining
    (reference: training.py:77-123)."""

    def __init__(self, model, params, loss_fn, train_window: int = 252,
                 test_window: int = 21, retrain_freq: int = 21,
                 lr: float = 0.001):
        self.model = model
        self.params = params
        self.loss_fn = loss_fn
        self.train_window = train_window
        self.test_window = test_window
        self.retrain_freq = retrain_freq
        self.lr = lr
        self._fit = None  # jitted once; windows share one executable

    def train_test_split(self, data, start: int):
        train_end = start + self.train_window
        test_end = train_end + self.test_window
        q, rets = data
        return ((q[start:train_end], rets[start:train_end]),
                (q[train_end:test_end], rets[train_end:test_end]))

    def train_epoch(self, train_data, n_epochs: int = 10) -> float:
        """Fresh Adam per window, as in the reference (training.py:93).

        The whole window fits in ONE jitted lax.scan compiled once per
        (lr, loss_fn) — windows have identical shapes, so every retrain
        window reuses the executable (no per-window retrace), while
        mutating self.lr / self.loss_fn between windows still takes
        effect (the cache is keyed on them, not frozen at first call)."""
        if n_epochs <= 0:
            return 0.0  # no-op, params untouched (pre-scan behavior)
        q, rets = (jnp.asarray(a) for a in train_data)
        key = (self.lr, self.loss_fn)
        if self._fit is None or self._fit[0] != key:
            tx = optax.adam(self.lr)
            loss_fn = self.loss_fn

            def fit(params, q, rets, n_epochs):
                opt_state = tx.init(params)

                def body(carry, _):
                    params, opt_state = carry

                    def _loss(p):
                        return loss_fn(self.model(p, q), rets)

                    loss, grads = jax.value_and_grad(_loss)(params)
                    updates, opt_state = tx.update(updates=grads,
                                                   state=opt_state,
                                                   params=params)
                    return (optax.apply_updates(params, updates),
                            opt_state), loss

                (params, _), losses = jax.lax.scan(
                    body, (params, opt_state), None, length=n_epochs)
                return params, losses[-1]

            self._fit = (key, jax.jit(fit, static_argnums=3))
        self.params, loss = self._fit[1](self.params, q, rets, n_epochs)
        return float(loss)

    def evaluate(self, test_data) -> float:
        q, rets = (jnp.asarray(a) for a in test_data)
        w = self.model(self.params, q)
        pr = (w[:, None, :] * rets).sum(-1)
        sharpe = pr.mean() / jnp.maximum(jnp.std(pr, ddof=1), 1e-8)
        return float(sharpe)

    def run(self, full_data, n_periods: int) -> List[Dict[str, float]]:
        T = len(full_data[0])
        need = ((n_periods - 1) * self.retrain_freq + self.train_window
                + self.test_window)
        if T < need:
            # a truncated last window would evaluate Sharpe on < 2 rows
            # (ddof=1 std -> NaN) and re-trace the cached fit per shape
            raise ValueError(
                f"data has {T} rows but n_periods={n_periods} windows "
                f"need {need} (train {self.train_window} + test "
                f"{self.test_window}, retrain every {self.retrain_freq})")
        results = []
        for i in range(0, n_periods * self.retrain_freq, self.retrain_freq):
            train_data, test_data = self.train_test_split(full_data, i)
            train_loss = self.train_epoch(train_data)
            test_sharpe = self.evaluate(test_data)
            results.append({"train_loss": train_loss,
                            "test_sharpe": test_sharpe})
        return results
