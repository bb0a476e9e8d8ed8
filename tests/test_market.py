"""Market feature pipeline (data/market.py) on fabricated price frames —
no network; validates the reference feature recipe (data_loader.py:28-70)
and the text parser used by the demo UI."""

import numpy as np
import pandas as pd
import pytest

from vqvaehmm_tpu.data.market import (create_sequences, load_portfolio_data,
                                      prepare_sequences)
from vqvaehmm_tpu.serve.gradio_app import parse_market_text


@pytest.fixture
def frames(rng):
    n = 120
    idx = pd.bdate_range("2020-01-01", periods=n)
    prices = pd.DataFrame(
        100 * np.cumprod(1 + rng.normal(3e-4, 0.01, size=(n, 3)), axis=0),
        index=idx, columns=["AAA", "BBB", "CCC"])
    regime = pd.DataFrame({
        "^VIX": 15 + 5 * rng.random(n),
        "^TNX": 2 + rng.random(n),
        "SPY": 300 * np.cumprod(1 + rng.normal(2e-4, 0.008, n)),
    }, index=idx)
    return prices, regime


def test_prepare_sequences_recipe(frames):
    prices, regime = frames
    x_data, u_data, returns, aligned = prepare_sequences(prices, regime,
                                                         lookback=20)
    # 5 engineered x features, 4 regime features (reference recipe)
    assert x_data.shape[1] == 5
    assert u_data.shape[1] == 4
    assert len(x_data) == len(u_data) == len(returns) == len(aligned)
    assert np.isfinite(x_data).all() and np.isfinite(u_data).all()
    # rolling(20) warm-up rows are dropped
    assert len(x_data) <= len(prices) - 20


def test_create_sequences_windows(frames):
    prices, regime = frames
    x_data, u_data, _, _ = prepare_sequences(prices, regime)
    xs, us = create_sequences(x_data, u_data, seq_len=40, stride=10)
    assert xs.shape[1:] == (40, 5)
    assert us.shape[1:] == (40, 4)
    assert len(xs) == len(us) == (len(x_data) - 40 + 9) // 10
    # windows overlap with the configured stride
    np.testing.assert_array_equal(xs[1][:30], xs[0][10:])


def test_fixture_errors_never_fall_back_to_synthetic(tmp_path):
    """An explicit fixture_path that fails must raise, not silently
    substitute synthetic data (which would invalidate any quality number
    attributed to the fixture)."""
    with pytest.raises(Exception):
        load_portfolio_data(fixture_path=str(tmp_path / "missing.csv"),
                            log_fn=None)


def test_load_portfolio_data_synthetic_fallback():
    """Without network, the pipeline falls back to synthetic data with the
    documented shapes instead of crashing (the reference hard-requires
    yfinance)."""
    data = load_portfolio_data(tickers=["ZZZZZZ"], log_fn=None)
    xs, us = data["x_sequences"], data["u_sequences"]
    assert xs.ndim == 3 and xs.shape[1] == 5
    assert us.ndim == 3 and us.shape[1] == 4
    assert xs.dtype == np.float32


def test_parse_market_text_row_format():
    rows = "\n".join(" ".join(f"{v:.3f}" for v in np.arange(t, t + 6))
                     for t in range(5))
    x = parse_market_text(rows)
    assert x.shape == (1, 5, 6)
    np.testing.assert_allclose(x[0, 2, 0], 2.0, atol=1e-5)


def test_parse_market_text_flat_and_errors():
    flat = ", ".join(str(float(i)) for i in range(20))
    x = parse_market_text(flat)
    assert x.shape == (1, 5, 4)
    with pytest.raises(ValueError):
        parse_market_text("1 2 3")  # too few values


def test_load_fixture_frames_and_full_pipeline():
    """The committed market fixture loads into (prices, regime_data,
    regimes) frames and drives the full load_portfolio_data pipeline —
    the no-network replacement for the reference's yfinance pull."""
    import os

    from vqvaehmm_tpu.data.market import (REGIME_TICKERS,
                                          load_fixture_frames)

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "market_fixture.csv")
    prices, regime_data, regimes = load_fixture_frames(fixture)
    # regime indicator columns are split out of the price panel
    assert set(regime_data.columns) <= set(REGIME_TICKERS)
    assert not (set(prices.columns) & set(regime_data.columns))
    assert regimes is not None and set(np.unique(regimes)) <= {0, 1, 2}
    assert len(prices) == len(regime_data) == len(regimes)
    assert (prices.to_numpy() > 0).all()

    data = load_portfolio_data(fixture_path=fixture, log_fn=None)
    assert data["x_sequences"].ndim == 3
    assert data["x_sequences"].shape[0] == data["u_sequences"].shape[0]
    assert np.isfinite(data["x_sequences"]).all()


def test_create_dataloader_batches():
    """create_dataloader (reference data_loader.py:105-109) yields
    static-shape batches from raw sequence arrays."""
    from vqvaehmm_tpu.data.market import create_dataloader

    rng = np.random.default_rng(5)
    xs = rng.normal(size=(4, 5, 80)).astype(np.float32)
    us = rng.normal(size=(4, 4, 80)).astype(np.float32)
    n = 0
    for x, u, lens in create_dataloader(xs, us, batch_size=8,
                                        min_len=16, max_len=32):
        assert x.shape[0] == 8 and x.shape[1] == 5
        assert u.shape[:2] == (8, 4) and u.shape[2] == x.shape[2]
        assert (lens >= 16).all() and (lens <= 32).all()
        n += 1
    assert n == 1000 // 8  # reference len(dataset) == 1000 preserved
