"""Driver-side fits (O1/O2) — pure-numpy Nelder–Mead behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from seaexplorertools_spark.pipeline.driverside import (
    _fmin,
    _get_bias,
    fit_compass,
    fit_shear_bias,
)


def test_fmin_minimizes_quadratic():
    got = _fmin(lambda x: (x[0] - 3.0) ** 2 + 2.0, np.array([0.0]))
    assert got[0] == pytest.approx(3.0, abs=1e-3)


def test_fmin_multidim():
    got = _fmin(lambda x: (x[0] - 1) ** 2 + (x[1] + 2) ** 2, np.array([0.0, 0.0]))
    assert got[0] == pytest.approx(1.0, abs=1e-2)
    assert got[1] == pytest.approx(-2.0, abs=1e-2)


def test_fit_compass_reduces_field_rmsd():
    """O1 (reference :389-397): synthetic magnetometer with hard-iron offset
    — the fit must reduce RMSD of |B| vs the target."""
    rng = np.random.default_rng(2)
    n = 2000
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = rng.uniform(-0.3, 0.3, n)
    target = 500.0
    bx = target * np.cos(theta) * np.cos(phi) + 40.0  # hard-iron offset on x
    by = target * np.sin(theta) * np.cos(phi) - 25.0
    bz = target * np.sin(phi) + 10.0
    mag = pd.DataFrame({"magnetometer_x": bx, "magnetometer_y": by, "magnetometer_z": bz})

    def rmsd(cs):
        a = np.reshape(cs[:9], (3, 3))
        b = cs[9:12]
        v = a @ np.array([bx - b[0], by - b[1], bz - b[2]])
        return np.sqrt(np.mean((np.sqrt((v**2).sum(axis=0)) - target) ** 2))

    before = rmsd(np.array([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0], float))
    coeffs = fit_compass(mag, target)
    after = rmsd(np.array(coeffs))
    assert after < before * 0.5, (before, after)


def test_shear_bias_recovers_known_coeff():
    """O2 (reference calc_bias :1954-1984): inject a bias proportional to a
    known coefficient, the fit must cancel it (recover ≈ -known)."""
    rng = np.random.default_rng(3)
    speed = np.abs(rng.normal(0.25, 0.02, (40, 30)))
    speed[rng.random(speed.shape) < 0.1] = np.nan
    clean = rng.normal(0, 0.02, (40, 30))
    injected = 0.7
    biased_e = clean + _get_bias(speed, injected)
    biased_n = clean + _get_bias(speed, injected)
    coeff = fit_shear_bias(biased_e, biased_n, speed, speed)
    assert coeff == pytest.approx(-injected, abs=0.05)
