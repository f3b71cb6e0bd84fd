"""F7 — oceanographic (TEOS-10 / gsw) functions.

The reference calls the ``gsw`` library for soundspeed (process_adcp.py:
107-109), depth from pressure (:184) and degree→meter distance
(:1386-1387). ``gsw`` is numpy-vectorized, so when it is installed we wrap
it in Arrow-batched pandas UDFs; when it is not (this container), we fall
back to published closed-form approximations and say so:

- soundspeed: Mackenzie (1981) 9-term equation (J. Acoust. Soc. Am. 70,
  807-812) — ±0.07 m/s vs full TEOS-10 over oceanic ranges, far inside the
  pipeline's rtol=1e-3 golden tolerance.
- depth from pressure: Saunders (1981) formula (J. Phys. Oceanogr. 11,
  573-574): z = (1 − c1)·p − c2·p², c1 = (5.92 + 5.25·sin²lat)·1e-3,
  c2 = 2.21e-6 — the classic UNESCO pressure→depth conversion.

Distance closed forms live in ``functions/geodesy.py`` (the reference's own
constants).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only where gsw is installed
    import gsw as _gsw  # noqa: F401

    HAVE_GSW = True
except Exception:  # pragma: no cover
    HAVE_GSW = False


def soundspeed_mackenzie(temp_c: Column, salinity: Column, depth_m: Column) -> Column:
    """Mackenzie (1981) sound speed c(T, S, D) in m/s — closed-form column
    expression (no UDF)."""
    t, s, d = temp_c, salinity, depth_m
    return (
        F.lit(1448.96)
        + F.lit(4.591) * t
        - F.lit(5.304e-2) * t * t
        + F.lit(2.374e-4) * t * t * t
        + F.lit(1.340) * (s - F.lit(35.0))
        + F.lit(1.630e-2) * d
        + F.lit(1.675e-7) * d * d
        - F.lit(1.025e-2) * t * (s - F.lit(35.0))
        - F.lit(7.139e-13) * t * d * d * d
    )


def depth_from_pressure(pressure_dbar: Column, lat_deg: Column) -> Column:
    """Saunders (1981) pressure→depth (m, positive down) — stands in for
    -gsw.z_from_p (reference :184)."""
    sin2 = F.pow(F.sin(F.radians(lat_deg)), 2)
    c1 = (F.lit(5.92) + F.lit(5.25) * sin2) * F.lit(1e-3)
    c2 = F.lit(2.21e-6)
    p = pressure_dbar
    return (F.lit(1.0) - c1) * p - c2 * p * p


def soundspeed(temp_c: Column, salinity: Column, depth_m: Column) -> Column:
    """Engine soundspeed: real gsw via pandas UDF when available, Mackenzie
    closed form otherwise. (With gsw absent the closed form IS the engine
    definition — documented deviation from gsw.sound_speed, well inside the
    reference's rtol=1e-3.)"""
    if not HAVE_GSW:
        return soundspeed_mackenzie(temp_c, salinity, depth_m)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ss(t: pd.Series, s: pd.Series, d: pd.Series) -> pd.Series:  # pragma: no cover
        import gsw

        # practical approximation: SA≈SP, CT≈t, p≈d (dbar≈m)
        return pd.Series(gsw.sound_speed(s.values, t.values, d.values))

    return _ss(temp_c, salinity, depth_m)
