"""Market data pipeline (reference: data_loader.py:9-126).

Host-side pandas feature engineering, identical recipe:
x = [mean return, volume-proxy, rolling vol, momentum, log-returns],
u = [VIX, 10y yield, SPY 20d return, SPY 20d vol]; overlapping windows
seq_len=100 stride=20; output arrays shaped (N, feat, T).

yfinance is imported lazily and failures fall back to the synthetic
generator so the pipeline runs in air-gapped environments (the reference
hard-requires network access).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

DEFAULT_TICKERS = ["AAPL", "MSFT", "JPM", "XOM", "JNJ", "WMT", "PG", "V",
                   "UNH", "HD"]
REGIME_TICKERS = ["^VIX", "^TNX", "SPY"]


def download_data(tickers: List[str], regime_tickers: List[str],
                  start_date: str = "2015-01-01",
                  end_date: str = "2024-01-01"):
    """yfinance close-price download (reference: data_loader.py:9-25)."""
    import pandas as pd
    import yfinance as yf

    prices_raw = yf.download(tickers, start=start_date, end=end_date,
                             auto_adjust=True, group_by="ticker")
    regime_raw = yf.download(regime_tickers, start=start_date,
                             end=end_date, auto_adjust=True,
                             group_by="ticker")
    if isinstance(prices_raw.columns, pd.MultiIndex):
        prices = prices_raw.xs("Close", level=1, axis=1)
    else:
        prices = prices_raw
    if isinstance(regime_raw.columns, pd.MultiIndex):
        regime_data = regime_raw.xs("Close", level=1, axis=1)
    else:
        regime_data = regime_raw
    return prices, regime_data


def prepare_sequences(prices, regime_data, lookback: int = 20):
    """Engineer (x, u) feature panels (reference: data_loader.py:28-59)."""
    import numpy as np
    import pandas as pd

    returns = prices.pct_change().dropna()
    volatility = returns.rolling(lookback).std()
    momentum = prices.pct_change(lookback)
    log_returns = np.log1p(returns)
    volume_proxy = returns.abs().rolling(lookback).mean()

    x_features = pd.DataFrame({
        "returns": returns.mean(axis=1),
        "volume": volume_proxy.mean(axis=1),
        "volatility": volatility.mean(axis=1),
        "momentum": momentum.mean(axis=1),
        "log_returns": log_returns.mean(axis=1),
    })
    u_features = pd.DataFrame({
        "vix": regime_data["^VIX"],
        "yield": regime_data["^TNX"],
        "market_return": regime_data["SPY"].pct_change(lookback),
        "market_vol": regime_data["SPY"].pct_change()
                      .rolling(lookback).std(),
    })
    combined = pd.concat([x_features, u_features], axis=1).dropna()
    x_data = combined[x_features.columns].values
    u_data = combined[u_features.columns].values
    return (x_data, u_data, returns.loc[combined.index],
            prices.loc[combined.index])


def create_sequences(x_data: np.ndarray, u_data: np.ndarray,
                     seq_len: int = 100, stride: int = 20
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Overlapping windows (reference: data_loader.py:62-70)."""
    xs, us = [], []
    for i in range(0, len(x_data) - seq_len, stride):
        xs.append(x_data[i:i + seq_len])
        us.append(u_data[i:i + seq_len])
    return np.array(xs), np.array(us)


def load_fixture_frames(fixture_path: str):
    """Load a committed close-price panel (tests/fixtures/market_fixture.csv)
    into the same (prices, regime_data) frames `download_data` returns, so
    the whole feature recipe (reference: data_loader.py:28-70) runs on it
    without network access. A `__regime__` ground-truth column, if present,
    is split off and returned third (else None)."""
    import pandas as pd

    frame = pd.read_csv(fixture_path, index_col="Date", parse_dates=True)
    regimes = None
    if "__regime__" in frame.columns:
        regimes = frame.pop("__regime__").astype(int)
    regime_cols = [c for c in REGIME_TICKERS if c in frame.columns]
    prices = frame[[c for c in frame.columns if c not in regime_cols]]
    regime_data = frame[regime_cols]
    return prices, regime_data, regimes


def load_portfolio_data(tickers: Optional[List[str]] = None,
                        start_date: str = "2015-01-01",
                        end_date: str = "2024-01-01",
                        fallback_synthetic: bool = True,
                        fixture_path: Optional[str] = None,
                        log_fn=print) -> Dict:
    """Complete pipeline (reference: data_loader.py:73-102); returns dict of
    (N, feat, T) float32 arrays + aligned returns/prices frames.

    With `fixture_path` (or env VQHMM_MARKET_FIXTURE) the prices come from a
    committed CSV panel instead of yfinance; everything downstream of
    `download_data` is byte-identical to the live path."""
    import os

    tickers = tickers or DEFAULT_TICKERS
    fixture_path = fixture_path or os.environ.get("VQHMM_MARKET_FIXTURE")
    try:
        if fixture_path:
            if log_fn:
                log_fn(f"Loading fixture {fixture_path}...")
            prices, regime_data, _ = load_fixture_frames(fixture_path)
            prices = prices.loc[start_date:end_date]
            regime_data = regime_data.loc[start_date:end_date]
            tickers = list(prices.columns)
        else:
            if log_fn:
                log_fn("Downloading data...")
            prices, regime_data = download_data(tickers, REGIME_TICKERS,
                                                start_date, end_date)
        x_data, u_data, returns, aligned = prepare_sequences(prices,
                                                             regime_data)
        x_seq, u_seq = create_sequences(x_data, u_data)
        x_seq = np.transpose(x_seq, (0, 2, 1)).astype(np.float32)
        u_seq = np.transpose(u_seq, (0, 2, 1)).astype(np.float32)
        return {"x_sequences": x_seq, "u_sequences": u_seq,
                "returns": returns, "prices": aligned, "tickers": tickers}
    except Exception as e:
        if fixture_path or not fallback_synthetic:
            # a fixture is an explicit local input: a typo'd path or a
            # malformed CSV is a caller bug, and silently substituting
            # synthetic data would quietly invalidate quality numbers
            # measured "on the fixture"
            raise
        if log_fn:
            log_fn(f"market data unavailable ({e}); using synthetic data")
        from .synthetic import synthetic_sequences

        xs, us, _ = synthetic_sequences(n_sequences=32, seq_len=100,
                                        input_dim=5, u_dim=4, seed=0)
        return {"x_sequences": xs, "u_sequences": us, "returns": None,
                "prices": None, "tickers": tickers}


def create_dataloader(x_sequences, u_sequences, batch_size: int = 32,
                      min_len: int = 20, max_len: int = 100):
    """RandomChunkDataset + static-shape batch iterator
    (reference: data_loader.py:105-109)."""
    from .dataset import RandomChunkDataset, batch_iterator

    dataset = RandomChunkDataset(x_sequences, u_sequences, min_len=min_len,
                                 max_len=max_len)
    return batch_iterator(dataset, batch_size)
