"""Gradio demo UI (reference: app.py:8-110).

Text-box market data -> encode -> portfolio head -> allocation table +
named regimes (Bull/Bear/Neutral).  gradio is import-gated (not part of
this image); `build_demo` returns the Blocks app when available.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

REGIME_NAMES = ["Bull", "Bear", "Neutral"]


def parse_market_text(text: str, input_dim: int = 5) -> np.ndarray:
    """Parse comma/space/newline-separated floats into a (1, C, T) array.

    Accepts either C rows of T values (one row per line) or a flat list
    reshaped into C feature rows.
    """
    def parse_floats(s: str) -> np.ndarray:
        toks = s.replace(",", " ").split()
        return np.array([float(t) for t in toks], np.float64)

    rows = [r.strip() for r in text.strip().splitlines() if r.strip()]
    if len(rows) == input_dim:
        data = [parse_floats(r) for r in rows]
        T = min(len(d) for d in data)
        if T < 3:
            raise ValueError("need at least 3 timesteps per feature row")
        return np.stack([d[:T] for d in data])[None].astype(np.float32)
    flat = parse_floats(text)
    if flat.size < input_dim * 3:
        raise ValueError(
            f"need at least {input_dim * 3} values ({input_dim} features x "
            f">=3 timesteps)")
    T = flat.size // input_dim
    return flat[:input_dim * T].reshape(1, input_dim, T).astype(np.float32)


def run_inference(text: str, posterior_fn, weight_fn,
                  tickers: Optional[list] = None):
    import jax.numpy as jnp

    x = parse_market_text(text)
    q = np.asarray(posterior_fn(jnp.asarray(x)))   # (1, K, T)
    weights = np.asarray(weight_fn(jnp.asarray(q)))[0]
    k = int(q[0, :, -1].argmax())
    regime = REGIME_NAMES[k] if k < len(REGIME_NAMES) else f"Regime {k}"
    tickers = tickers or [f"ASSET{i}" for i in range(len(weights))]
    alloc = {t: f"{w * 100:.2f}%" for t, w in zip(tickers, weights)}
    return regime, {n: float(p) for n, p in
                    zip(REGIME_NAMES[:q.shape[1]], q[0, :, -1])}, alloc


def make_infer_fn(config_path: str = "inference_config.json"):
    """The demo's click callback, text -> (regime, probs, allocation),
    independent of gradio so the inference path is testable and reusable
    anywhere (reference: app.py:56-98's predict closure)."""
    import jax

    from ..models.portfolio import HeadConfig, TransformerPortfolioOptimizer
    from .app import get_model

    m = get_model(config_path)
    # head_checkpoint_path is honored here (the _get_head loader handles
    # .npz AND the reference's .pt heads) — unlike the reference demo,
    # which constructs a TransformerPortfolioOptimizer but loads
    # portfolio_improved.pt's Improved state_dict into it (app.py:9-17):
    # the load_state_dict fails and the try/except serves random init.
    if m.cfg.head_checkpoint_path:
        head, head_params = m._get_head()
    else:
        head = TransformerPortfolioOptimizer(HeadConfig(
            K=m.cfg.model.K, n_assets=m.cfg.portfolio.n_assets,
            hidden_dim=m.cfg.portfolio.hidden_dim))
        head_params = head.init(jax.random.PRNGKey(0))

    def infer(text):
        def posterior_fn(x):
            return m.model.posterior(m.params, x)

        def weight_fn(q):
            return head(head_params, q)

        return run_inference(text, posterior_fn, weight_fn)

    return infer


def build_demo(config_path: str = "inference_config.json"):
    """Construct the Gradio Blocks app (requires `pip install gradio`)."""
    import gradio as gr

    infer = make_infer_fn(config_path)

    with gr.Blocks(title="VQ-VAE-HMM regime detection") as demo:
        gr.Markdown("# Market regime detection & allocation")
        inp = gr.Textbox(lines=6, label="Market data "
                         "(5 feature rows x T timesteps)")
        btn = gr.Button("Analyze")
        regime = gr.Textbox(label="Current regime")
        probs = gr.JSON(label="Regime probabilities")
        alloc = gr.JSON(label="Allocation")
        btn.click(infer, inputs=inp, outputs=[regime, probs, alloc])
    return demo


if __name__ == "__main__":
    build_demo().launch()
