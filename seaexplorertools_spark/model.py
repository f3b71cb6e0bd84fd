"""Long-format schemas for the ADCP/glider data model (SURVEY §1.4).

The reference holds a pandas table (glider) and an xarray ping×bin cube
(ADCP). The engine's canonical layout:

- ``glider``     : one row per nav/CTD sample.
- ``adcp_ping``  : one row per ping (attitude, pressure, magnetometer).
- ``adcp_cells`` : one row per (ping, bin) — beam velocities/correlations/
                   amplitudes. Joined 1:N to adcp_ping on time_us.
- ``adcp_bt``    : sparse bottom-track pings.

Times are BIGINT epoch-µs (``time_us``) everywhere — the reference keeps a
float epoch-ns shadow column (process_adcp.py:105); µs-as-long is exact in
doubles (< 2^53) for all interp math.

At 100 TB the two ADCP tables partition by mission/day and co-bucket on
time_us so the ping↔cells join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _d(name: str) -> StructField:
    return StructField(name, DoubleType(), True)


GLIDER_SCHEMA = StructType(
    [
        StructField("time_us", LongType(), False),
        _d("temperature"),
        _d("salinity"),
        _d("latitude"),
        _d("longitude"),
        _d("pressure"),
        StructField("profile_number", LongType(), True),
        _d("declination"),
        _d("soundspeed"),
        _d("speed_vert"),
        _d("speed_horz"),
        StructField("DeadReckoning", LongType(), True),
        StructField("NAV_RESOURCE", LongType(), True),
        StructField("diveNum", LongType(), True),
    ]
)

ADCP_PING_SCHEMA = StructType(
    [
        StructField("time_us", LongType(), False),
        _d("pressure"),
        _d("pitch"),
        _d("roll"),
        _d("heading"),
        _d("magnetometer_x"),
        _d("magnetometer_y"),
        _d("magnetometer_z"),
        _d("speed_of_sound"),
    ]
)

ADCP_CELLS_SCHEMA = StructType(
    [StructField("time_us", LongType(), False), StructField("bin", IntegerType(), False)]
    + [_d(f"velocity_beam{b}") for b in (1, 2, 3, 4)]
    + [_d(f"correlation_beam{b}") for b in (1, 2, 3, 4)]
    + [_d(f"amplitude_beam{b}") for b in (1, 2, 3, 4)]
)

ADCP_BT_SCHEMA = StructType(
    [StructField("time_us", LongType(), False)]
    + [_d(f"velocity_beam{b}") for b in (1, 2, 4)]
    + [_d(f"fom_beam{b}") for b in (1, 2, 4)]
    + [_d("pressure"), _d("speed_of_sound"), _d("heading"), _d("pitch"), _d("roll")]
)

# Config attrs carried from the instrument (reference NetCDF Config group,
# process_adcp.py:162-163, :878-879) — a small broadcast dict, not per-row data.
DEFAULT_ATTRS = {"avg_cellSize": 2.0, "avg_blankingDistance": 0.5}
