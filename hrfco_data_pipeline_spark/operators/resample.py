"""Per-station time-series regularization via grouped-map pandas.

The reference stores raw observations and lets the dashboard render
whatever cadence arrives (SURVEY §1/§2: the hypertable keeps the raw
event times); any downstream model wants a regular grid. This operator
snaps each station's series to a fixed frequency and linearly
interpolates interior holes — a genuinely non-relational, per-group
imperative computation, which is exactly the case for
``applyInPandas`` (Arrow-batched grouped map) rather than joins or
window tricks.

Scale shape: one shuffle on the station key; per-group memory is the
station's grid span (bounded by the retention window ÷ frequency —
e.g. 500 points for 500 × 10 min, per K2's retention cap), independent
of corpus size. No driver collection, no row-at-a-time UDFs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

RESAMPLED_SCHEMA = (
    "wlobscd string, grid_ts timestamp, water_level double, interpolated boolean"
)


def _resample_fn(freq_minutes: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("obs_ts").dropna(subset=["obs_ts"])
        if pdf.empty:
            return pd.DataFrame(
                columns=["wlobscd", "grid_ts", "water_level", "interpolated"]
            )
        key = pdf["wlobscd"].iloc[0]
        s = pdf.set_index("obs_ts")["water_level"]
        # bucket mean snaps in-bucket readings to the grid; empty
        # buckets become NaN holes for the interpolator
        g = s.resample(f"{freq_minutes}min").mean()
        filled = g.interpolate(method="linear", limit_area="inside")
        out = pd.DataFrame(
            {
                "wlobscd": key,
                "grid_ts": filled.index,
                "water_level": filled.to_numpy(),
                "interpolated": (g.isna() & filled.notna()).to_numpy(),
            }
        )
        # leading/trailing holes stay NaN -> drop (no extrapolation)
        return out[out["water_level"].notna()]

    return fn


def resample_stations(df: DataFrame, freq_minutes: int = 10) -> DataFrame:
    """Regularize (wlobscd, obs_ts, water_level) to a ``freq_minutes``
    grid per station; interior holes linearly interpolated, edges never
    extrapolated. Input needs exactly those three columns."""
    return (
        df.select("wlobscd", "obs_ts", "water_level")
        .groupBy("wlobscd")
        .applyInPandas(_resample_fn(freq_minutes), RESAMPLED_SCHEMA)
    )
