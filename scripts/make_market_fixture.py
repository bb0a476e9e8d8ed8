"""Generate the committed market-data fixture (tests/fixtures/market_fixture.csv).

The build environment has no network egress, so the reference's yfinance pull
(reference: data_loader.py:9-25) cannot run here. This script produces a
deterministic daily close-price panel with the same schema yfinance returns —
10 equity tickers + ^VIX + ^TNX + SPY over 2015-01-01..2024-01-01 — from a
3-regime (calm / correction / crisis) Markov-switching factor model calibrated
to the period's published stylized facts:

- sticky regimes (expected durations ~200 / ~33 / ~12 trading days),
- SPY ~10%/yr drift, 12% calm vol vs 35-70% stress vol, Student-t(5) shocks,
- VIX level driven by the active regime and anti-correlated with SPY returns,
- ^TNX a slowly mean-reverting 10y-yield path (0.5%..5% band, hiking drift
  after mid-2021),
- equities = beta * market + idiosyncratic t-noise, beta in [0.8, 1.3].

The fixture exists so the reference's full feature recipe
(data_loader.py:28-70) and downstream pipeline can run end-to-end on a
committed, reproducible frame. It is simulated, not recorded — stated plainly
in artifacts/ and BENCH_NOTES.md wherever its numbers appear.

Run: python scripts/make_market_fixture.py  (rewrites the CSV; seed fixed)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "market_fixture.csv")

TICKERS = ["AAPL", "MSFT", "JPM", "XOM", "JNJ", "WMT", "PG", "V", "UNH", "HD"]

# per-regime daily market params: (drift/day, vol/day)
REGIME_MU = np.array([0.00055, -0.0006, -0.004])
REGIME_VOL = np.array([0.0075, 0.022, 0.045])
# sticky transition matrix: calm, correction, crisis
TRANS = np.array([
    [0.9950, 0.0045, 0.0005],
    [0.0280, 0.9600, 0.0120],
    [0.0100, 0.0700, 0.9200],
])
VIX_LEVEL = np.array([14.0, 26.0, 52.0])


def main(seed: int = 20150101) -> str:
    import pandas as pd

    rng = np.random.default_rng(seed)
    dates = pd.bdate_range("2015-01-01", "2023-12-29")
    T = len(dates)

    # regime path
    z = np.zeros(T, dtype=np.int64)
    for t in range(1, T):
        z[t] = rng.choice(3, p=TRANS[z[t - 1]])

    # market (SPY) returns: regime-switching drift/vol, t(5) shocks
    shock = rng.standard_t(df=5, size=T) / np.sqrt(5.0 / 3.0)
    mkt = REGIME_MU[z] + REGIME_VOL[z] * shock

    # VIX: regime anchor + AR(1) noise, minus leverage response to mkt moves
    vix = np.zeros(T)
    vix[0] = VIX_LEVEL[z[0]]
    for t in range(1, T):
        vix[t] = (0.92 * vix[t - 1] + 0.08 * VIX_LEVEL[z[t]]
                  - 180.0 * min(mkt[t], 0.0) * REGIME_VOL[z[t]] / 0.0075
                  + rng.normal(0.0, 0.6))
    vix = np.clip(vix, 9.0, 85.0)

    # 10y yield: mean-reverting walk, hiking drift in the back third
    tnx = np.zeros(T)
    tnx[0] = 2.1
    for t in range(1, T):
        target = 1.8 if t < 2 * T // 3 else 4.0
        tnx[t] = tnx[t - 1] + 0.004 * (target - tnx[t - 1]) \
            + rng.normal(0.0, 0.028) - 0.35 * (z[t] == 2) * 0.02
    tnx = np.clip(tnx, 0.5, 5.2)

    # equities: beta * market + idiosyncratic t-noise + small alpha spread
    betas = rng.uniform(0.8, 1.3, size=len(TICKERS))
    alphas = rng.normal(0.00008, 0.00006, size=len(TICKERS))
    idio_vol = rng.uniform(0.009, 0.016, size=len(TICKERS))
    idio = rng.standard_t(df=5, size=(T, len(TICKERS))) / np.sqrt(5.0 / 3.0)
    eq_ret = alphas + np.outer(mkt, betas) + idio * idio_vol

    start_px = rng.uniform(40.0, 300.0, size=len(TICKERS))
    eq_px = start_px * np.exp(np.cumsum(np.log1p(eq_ret), axis=0))
    spy_px = 200.0 * np.exp(np.cumsum(np.log1p(mkt)))

    frame = pd.DataFrame(eq_px, index=dates, columns=TICKERS)
    frame["^VIX"] = vix
    frame["^TNX"] = tnx
    frame["SPY"] = spy_px
    frame["__regime__"] = z  # ground-truth column, dropped by the loader
    frame.index.name = "Date"

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    frame.to_csv(OUT, float_format="%.6f")
    print(f"wrote {OUT}: {frame.shape[0]} days x {frame.shape[1]} cols, "
          f"regime days: {np.bincount(z, minlength=3).tolist()}")
    return OUT


if __name__ == "__main__":
    main()
