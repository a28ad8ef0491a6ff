"""Frequency-domain integration: analytic checks, leakage, severity."""

import numpy as np
import pytest

from apda_fft_tpu.ops.integrate import (
    G_TO_MMS2,
    displacement,
    integrate_acceleration,
    velocity,
    velocity_rms,
)

FS = 500.0
N = 4096
MID = slice(N // 4, 3 * N // 4)  # flat region of the default Tukey taper


def tone(a0=2.0, f0=25.0, n=N, fs=FS):
    t = np.arange(n) / fs
    return (a0 * np.sin(2 * np.pi * f0 * t)).astype(np.float32), t


def test_velocity_analytic_amplitude_and_phase():
    a0, f0 = 2.0, 25.0
    x, t = tone(a0, f0)
    v = np.asarray(velocity(x, FS))
    w = 2 * np.pi * f0
    # a = a0 sin(wt)  ->  v = -(a0/w) cos(wt)
    assert np.max(np.abs(v[MID])) == pytest.approx(a0 / w, rel=2e-3)
    corr = np.corrcoef(v[MID], -np.cos(w * t[MID]))[0, 1]
    assert corr > 0.9999


def test_displacement_analytic():
    a0, f0 = 2.0, 25.0
    x, t = tone(a0, f0)
    d = np.asarray(displacement(x, FS))
    w = 2 * np.pi * f0
    # d = -(a0/w^2) sin(wt): antiphase with the acceleration.
    assert np.max(np.abs(d[MID])) == pytest.approx(a0 / w**2, rel=0.01)
    assert np.corrcoef(d[MID], -np.sin(w * t[MID]))[0, 1] > 0.999


def test_off_bin_leakage_controlled_by_taper():
    # 25 Hz is NOT on the N=4096/fs=500 bin grid; untapered, the leaked
    # low-frequency skirt is amplified by 1/w^2 into a ~5x displacement
    # error (measured).  The default taper must hold it to ~1%.
    a0, f0 = 2.0, 25.0
    x, _ = tone(a0, f0)
    w = 2 * np.pi * f0
    d_untapered = np.asarray(displacement(x, FS, edge_taper=0.0))
    d_tapered = np.asarray(displacement(x, FS))
    assert np.max(np.abs(d_untapered[MID])) > 2.0 * a0 / w**2  # the trap
    assert np.max(np.abs(d_tapered[MID])) == pytest.approx(a0 / w**2, rel=0.01)


def test_highpass_removes_low_tone():
    t = np.arange(N) / FS
    lo = 1.0 * np.sin(2 * np.pi * 1.0 * t)
    hi = 1.0 * np.sin(2 * np.pi * 50.0 * t)
    v = np.asarray(velocity((lo + hi).astype(np.float32), FS, f_highpass=10.0))
    # Only the 50 Hz term survives: amplitude 1/(2 pi 50).
    assert np.max(np.abs(v[MID])) == pytest.approx(
        1.0 / (2 * np.pi * 50.0), rel=5e-3)


def test_velocity_rms_analytic_and_units():
    a0, f0 = 2.0, 25.0
    x, _ = tone(a0, f0)
    r = float(velocity_rms(x, FS, band=(10.0, 200.0)))
    expect = a0 / (2 * np.pi * f0) / np.sqrt(2)
    assert r == pytest.approx(expect, rel=2e-3)
    # g -> mm/s conversion constant: 1 g = 9806.65 mm/s^2.
    assert r * G_TO_MMS2 == pytest.approx(expect * 9806.65, rel=1e-6)


def test_velocity_rms_band_excludes_out_of_band_tone():
    t = np.arange(N) / FS
    x = (np.sin(2 * np.pi * 5.0 * t) + 0.5 * np.sin(2 * np.pi * 60.0 * t)
         ).astype(np.float32)
    r = float(velocity_rms(x, FS, band=(30.0, 200.0)))
    expect = 0.5 / (2 * np.pi * 60.0) / np.sqrt(2)  # 5 Hz tone excluded
    assert r == pytest.approx(expect, rel=5e-3)


def test_batched_and_validation():
    xs = np.stack([tone(2.0, 25.0)[0], tone(1.0, 40.0)[0]])
    v = np.asarray(velocity(xs, FS))
    assert v.shape == xs.shape
    np.testing.assert_allclose(v[1], np.asarray(velocity(xs[1], FS)), rtol=1e-6)
    r = np.asarray(velocity_rms(xs, FS))
    assert r.shape == (2,)
    with pytest.raises(ValueError):
        integrate_acceleration(np.zeros(4), FS)
    with pytest.raises(ValueError):
        integrate_acceleration(np.zeros(64), FS, order=3)
    with pytest.raises(ValueError):
        integrate_acceleration(np.zeros(64), FS, edge_taper=1.5)
    with pytest.raises(ValueError):
        velocity_rms(np.zeros(64), FS, band=(0.0, 10.0))


def test_double_integration_consistency():
    # displacement == velocity integrated once more (same spectral path).
    x, _ = tone(2.0, 25.0)
    d = np.asarray(displacement(x, FS, f_highpass=5.0))
    v = np.asarray(velocity(x, FS, f_highpass=5.0))
    d2 = np.asarray(velocity(v, FS, f_highpass=5.0, edge_taper=0.0))
    np.testing.assert_allclose(d[MID], d2[MID], atol=3e-6)
