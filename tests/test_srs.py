"""Shock Response Spectrum: oracle parity, physics, batching, CLI.

The device path (f32 associative-scan Smallwood bank, ``ops/srs.py``) is
gated against a float64 sequential ``scipy.signal.lfilter`` oracle with
identical coefficients, and against the textbook half-sine-pulse SRS
facts (peak near ``0.8/tau``, ~1.65x amplification at Q=10, high-frequency
asymptote -> peak input acceleration).
"""

import json

import numpy as np
import pytest
import scipy.signal as sig

from apda_fft_tpu.io import logfile
from apda_fft_tpu.ops.srs import (
    shock_response_spectrum,
    smallwood_coefficients,
    srs_frequencies,
)

FS = 1000.0
TAU = 0.011  # half-sine duration: peak SRS expected near 0.8/tau ~ 73 Hz


def half_sine(amp=50.0, tau=TAU, fs=FS, n=512, noise=0.0, seed=0):
    t = np.arange(n) / fs
    x = np.where(t < tau, amp * np.sin(np.pi * t / tau), 0.0)
    if noise:
        x = x + noise * np.random.default_rng(seed).standard_normal(n)
    return x.astype(np.float32)


def oracle_maximax(x, fs, freqs, q=10.0, residual=True):
    """Sequential float64 Smallwood bank - the ground truth."""
    b, a = smallwood_coefficients(freqs, fs, q)
    xp = np.asarray(x, np.float64)
    if residual:
        xp = np.concatenate([xp, np.zeros(int(np.ceil(fs / freqs.min())))])
    return np.array(
        [np.max(np.abs(sig.lfilter(b[:, i], a[:, i], xp)))
         for i in range(len(freqs))]
    )


def test_f32_scan_matches_f64_lfilter_oracle():
    x = half_sine(noise=0.5)
    res = shock_response_spectrum(x, FS, f_min=5.0, f_max=250.0)
    ref = oracle_maximax(x, FS, res.freqs)
    rel = np.max(np.abs(res.maximax - ref) / ref)
    # Measured 3.6e-6 (rotation-coordinate scan; the companion-matrix form
    # measured 2.9e-5 on its good bins and diverged 3.6x on low ones).
    assert rel < 5e-5


def test_signed_extremes_match_oracle():
    x = half_sine()
    res = shock_response_spectrum(x, FS, f_min=10.0, f_max=200.0)
    b, a = smallwood_coefficients(res.freqs, FS)
    xp = np.concatenate([np.asarray(x, np.float64),
                         np.zeros(int(np.ceil(FS / res.freqs.min())))])
    for i in [0, len(res.freqs) // 2, len(res.freqs) - 1]:
        y = sig.lfilter(b[:, i], a[:, i], xp)
        assert res.positive[i] == pytest.approx(np.max(y), rel=5e-5)
        assert res.negative[i] == pytest.approx(np.min(y), rel=5e-5)
        assert res.maximax[i] == pytest.approx(np.max(np.abs(y)), rel=5e-5)


def test_half_sine_physics():
    amp = 50.0
    res = shock_response_spectrum(half_sine(amp), FS, f_min=5.0, f_max=250.0)
    f_pk, a_pk = res.peak()
    # Textbook half-sine SRS: peak near 0.8/tau, amplification ~1.65 at Q=10.
    assert 0.55 / TAU <= f_pk <= 1.1 / TAU
    assert 1.4 * amp <= a_pk <= 1.8 * amp
    # High-frequency asymptote: a stiff oscillator follows the base exactly.
    assert res.maximax[-1] == pytest.approx(amp, rel=0.12)
    # SRS of a positive pulse is monotone-ish: no zero/negative entries.
    assert np.all(res.maximax > 0)


def test_low_frequency_bins_tree_stable():
    # Regression for the companion-matrix formulation: at fn*dt ~ 2.5e-3
    # with a 500-sample residual pad, the companion-form parallel scan
    # amplified jit-vs-eager ulp differences into a 3.6x-wrong maximax
    # (18.4 vs oracle 5.12 on XLA:CPU).  Rotation coordinates must match
    # the float64 oracle on exactly that case.
    x = half_sine(n=64)
    res = shock_response_spectrum(
        x, FS, freqs=np.array([2.0, 2.5198420997897464]))
    ref = oracle_maximax(x, FS, res.freqs)
    np.testing.assert_allclose(res.maximax, ref, rtol=5e-5)


def test_residual_phase_dominates_low_frequency():
    # For fn << 1/tau the oscillator barely moves during the pulse; its
    # extreme response is the post-pulse free decay.  Excluding the
    # residual phase must lose amplitude at the soft end of the bank.
    x = half_sine(n=64)  # record barely longer than the pulse
    with_res = shock_response_spectrum(x, FS, f_min=2.0, f_max=50.0)
    without = shock_response_spectrum(
        x, FS, f_min=2.0, f_max=50.0, residual=False)
    # Oracle-verified ratio at fn=2 Hz for this pulse/record: 1.317.
    assert with_res.maximax[0] > 1.25 * without.maximax[0]
    assert np.all(with_res.maximax >= without.maximax - 1e-5)


def test_batched_rows_equal_independent_runs():
    xs = np.stack([half_sine(50.0), half_sine(20.0, tau=0.03)])
    batch = shock_response_spectrum(xs, FS, f_min=5.0, f_max=100.0)
    for i in range(2):
        solo = shock_response_spectrum(xs[i], FS, f_min=5.0, f_max=100.0)
        np.testing.assert_allclose(batch.maximax[i], solo.maximax, rtol=1e-6)
    assert batch.maximax.shape == (2, len(batch.freqs))


def test_frequency_bank_grid():
    f = srs_frequencies(1.0, 64.0, points_per_octave=6)
    assert f[0] == 1.0 and f[-1] == pytest.approx(64.0, rel=1e-9)
    np.testing.assert_allclose(f[6] / f[0], 2.0, rtol=1e-12)  # one octave
    with pytest.raises(ValueError):
        srs_frequencies(0.0, 10.0)
    with pytest.raises(ValueError):
        smallwood_coefficients(np.array([600.0]), FS)  # >= Nyquist
    with pytest.raises(ValueError):
        shock_response_spectrum(np.zeros(2), FS)  # < 3 samples


def test_pseudo_velocity_and_peak():
    res = shock_response_spectrum(half_sine(), FS, f_min=10.0, f_max=100.0)
    np.testing.assert_allclose(
        res.pseudo_velocity, res.maximax / (2 * np.pi * res.freqs))
    f_pk, a_pk = res.peak()
    i = np.argmax(res.maximax)
    assert f_pk == res.freqs[i] and a_pk == res.maximax[i]


def test_cli_srs(tmp_path, capsys):
    from apda_fft_tpu.__main__ import main

    x = half_sine(n=256)
    path = tmp_path / "0013a20041e7f6b7_Xaxis_16_08_2026_10_20_30.log"
    logfile.write_acquisition_header(
        path, "10:20:30", "2g", "1000 Hz", "X axis", "Synced",
        means=["22.0", "0.01", "0.01", "0.98"], humidity=50.0,
        baselines=(0.0, 0.0, 0.0),
    )
    logfile.append_samples(path, [f"{v:8.6f}" for v in x])
    out = tmp_path / "srs.npz"

    rc = main(["srs", str(path), "--json", "--out", str(out)])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["q"] == 10.0 and payload["bank"] == len(payload["srs"])
    assert 40.0 <= payload["peak_freq"] <= 110.0  # ~0.8/tau on the bank
    saved = np.load(out)
    stem = path.stem
    np.testing.assert_allclose(
        saved[f"{stem}__pseudo_velocity"],
        saved[f"{stem}__maximax"] / (2 * np.pi * saved[f"{stem}__freqs"]),
        rtol=1e-6,
    )
