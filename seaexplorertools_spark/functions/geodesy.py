"""F7-adjacent geodesy — degree↔meter conversions and dead-reckoning math.

The reference uses the closed-form constants 111319.444 m/deg latitude and
40075000·cos(lat)/360 m/deg longitude for its dead-reckoning integration
(process_adcp.py:1244-1246) and gsw.distance for drift velocities
(:1386-1387, :1438-1439). The closed forms below match the reference's own
constants; gsw.distance parity is covered by the same formula on the
ellipsoid-free sphere the reference uses elsewhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M_PER_DEG_LAT = 111319.444  # reference :1245
EARTH_CIRCUM_M = 40075000.0  # reference :1246


def dlat_to_m(dlat_deg: Column) -> Column:
    return dlat_deg * F.lit(M_PER_DEG_LAT)


def dlon_to_m(dlon_deg: Column, lat_deg: Column) -> Column:
    return dlon_deg * F.lit(EARTH_CIRCUM_M) * F.cos(F.radians(lat_deg)) / F.lit(360.0)


def m_to_dlat(dy_m: Column) -> Column:
    return dy_m / F.lit(M_PER_DEG_LAT)


def m_to_dlon(dx_m: Column, lat_deg: Column) -> Column:
    return dx_m * F.lit(360.0) / (F.lit(EARTH_CIRCUM_M) * F.cos(F.radians(lat_deg)))
