"""Synthetic glider+ADCP mission for pipeline tests.

Shapes follow FIXTURES.md (reconstructed from the reference's column
accesses): sawtooth pressure profiles, GPS fixes at surfacings, 10 range
bins, plausible attitude. Values need not be physically consistent — the
tests verify operator semantics against numpy mini-implementations of the
reference math, not ocean physics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

T0_US = 1_700_000_000_000_000  # arbitrary epoch µs


def make_mission(n_dives: int = 6, samples_per_cast: int = 60, seed: int = 7):
    rng = np.random.default_rng(seed)
    rows = []
    t = 0.0
    lat, lon = 58.0, 11.0
    dt = 10.0
    prof = 0
    for dive in range(1, n_dives + 1):
        for updown in (0, 1):  # 0=descent (odd profile in ref), 1=ascent
            prof += 1
            for i in range(samples_per_cast):
                frac = i / (samples_per_cast - 1)
                pressure = 50.0 * (frac if updown == 0 else 1 - frac)
                surfaced = pressure < 1.0
                lat += 1e-6 * rng.normal(1.0, 0.1)
                lon += 1e-6 * rng.normal(0.5, 0.1)
                rows.append(
                    {
                        "time_us": int(T0_US + t * 1e6),
                        "temperature": 12.0 + rng.normal(0, 0.05),
                        "salinity": 35.0 + rng.normal(0, 0.01),
                        "latitude": lat,
                        "longitude": lon,
                        "pressure": pressure,
                        "profile_number": prof,
                        "declination": 4.5,
                        "soundspeed": 1500.0 + rng.normal(0, 0.2),
                        "speed_vert": (0.12 if updown == 0 else -0.12) + rng.normal(0, 0.005),
                        "speed_horz": 0.25 + rng.normal(0, 0.01),
                        "DeadReckoning": 0 if surfaced else 1,
                        "NAV_RESOURCE": 116 if surfaced else 100,
                        "diveNum": dive,
                    }
                )
                t += dt + rng.uniform(-0.5, 0.5)
    glider = pd.DataFrame(rows)

    # ADCP pings: offset clock, 1 ping per glider sample
    n_bins = 10
    ping_rows, cell_rows = [], []
    for _, r in glider.iterrows():
        tu = int(r.time_us + 3_000_000)
        updown = r.profile_number % 2 == 0
        pitch = -17.0 if not updown else 17.0
        ping_rows.append(
            {
                "time_us": tu,
                "pressure": r.pressure,
                "pitch": pitch + rng.normal(0, 0.5),
                "roll": rng.normal(0, 1.0),
                "heading": (40.0 + rng.normal(0, 2.0)) % 360,
                "magnetometer_x": rng.normal(200, 5),
                "magnetometer_y": rng.normal(-100, 5),
                "magnetometer_z": rng.normal(300, 5),  # positive → bottom-mounted
                "speed_of_sound": 1481.0,
            }
        )
        for b in range(n_bins):
            cell_rows.append(
                {
                    "time_us": tu,
                    "bin": b,
                    **{f"velocity_beam{k}": float(rng.normal(0, 0.2)) for k in (1, 2, 3, 4)},
                    **{f"correlation_beam{k}": float(np.clip(95 - 8 * b + rng.normal(0, 3), 0, 100)) for k in (1, 2, 3, 4)},
                    **{f"amplitude_beam{k}": float(60 + rng.normal(0, 3)) for k in (1, 2, 3, 4)},
                }
            )
    ping = pd.DataFrame(ping_rows)
    cells = pd.DataFrame(cell_rows)

    # sparse bottom-track near max depth
    bt_rows = []
    deep = ping[ping.pressure > 45]
    for _, r in deep.iloc[::3].iterrows():
        bt_rows.append(
            {
                "time_us": int(r.time_us + 500_000),
                "velocity_beam1": float(rng.normal(0.1, 0.05)),
                "velocity_beam2": float(rng.normal(0.1, 0.05)),
                "velocity_beam4": float(rng.normal(0.1, 0.05)),
                "fom_beam1": float(rng.uniform(2, 8)),
                "fom_beam2": float(rng.uniform(2, 8)),
                "fom_beam4": float(rng.uniform(2, 8)),
                "pressure": float(r.pressure + rng.normal(0, 1)),
                "speed_of_sound": 1481.0,
                "heading": float(r.heading),
                "pitch": float(r.pitch),
                "roll": float(r.roll),
            }
        )
    bt = pd.DataFrame(bt_rows)
    attrs = {"avg_cellSize": 2.0, "avg_blankingDistance": 0.5}
    return glider, ping, cells, bt, attrs
