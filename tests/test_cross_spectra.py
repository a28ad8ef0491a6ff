"""cross_psd / coherence: scipy-cross-checked multi-sensor spectral tools."""

import numpy as np
import pytest

from apda_fft_tpu.models.streaming import coherence, cross_psd, welch_psd


def _pair(T=1 << 16, fs=500.0, seed=0):
    """Two channels: shared 40 Hz mode (y phase-lagged) + independent noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fs
    mode = np.sin(2 * np.pi * 40.0 * t)
    x = (mode + 0.5 * rng.standard_normal(T)).astype(np.float32)
    y = (0.7 * np.sin(2 * np.pi * 40.0 * t - np.pi / 4)
         + 0.5 * rng.standard_normal(T)).astype(np.float32)
    return x, y, fs


def test_cross_psd_matches_scipy():
    import scipy.signal

    x, y, fs = _pair()
    window = 1024
    freqs, pxy = cross_psd(x, y, fs, window=window)
    w_sym = np.hanning(window)
    f_sp, p_sp = scipy.signal.csd(
        x.astype(np.float64), y.astype(np.float64), fs=fs, window=w_sym,
        nperseg=window, noverlap=window // 2, detrend="constant",
    )
    h = window // 2
    np.testing.assert_allclose(np.asarray(freqs), f_sp[:h], atol=1e-5)
    ours = np.asarray(pxy)[1:h]
    theirs = p_sp[1:h]
    # The shared tone's bin must match closely in magnitude AND phase.
    b = round(40.0 * window / fs)
    assert abs(ours[b - 1]) == pytest.approx(abs(theirs[b - 1]), rel=0.02)
    assert np.angle(ours[b - 1]) == pytest.approx(np.angle(theirs[b - 1]), abs=0.02)
    # y LAGS x by pi/4, so conj(X)*Y has phase -pi/4 (scipy convention).
    assert np.angle(ours[b - 1]) == pytest.approx(-np.pi / 4, abs=0.05)
    # Broadband agreement (noise bins jitter; compare smoothed magnitude).
    k = 32
    sm = lambda a: np.convolve(np.abs(a), np.ones(k) / k, mode="valid")
    np.testing.assert_allclose(sm(ours), sm(theirs), rtol=0.1)


def test_coherence_matches_scipy_and_separates_shared_from_noise():
    import scipy.signal

    x, y, fs = _pair()
    window = 1024
    freqs, cxy = coherence(x, y, fs, window=window)
    w_sym = np.hanning(window)
    f_sp, c_sp = scipy.signal.coherence(
        x.astype(np.float64), y.astype(np.float64), fs=fs, window=w_sym,
        nperseg=window, noverlap=window // 2, detrend="constant",
    )
    h = window // 2
    np.testing.assert_allclose(np.asarray(cxy)[1:h], c_sp[1:h], atol=0.02)
    b = round(40.0 * window / fs)
    assert float(cxy[b]) > 0.95          # shared mode: coherent
    noise_bins = np.asarray(cxy)[b + 30 : b + 200]
    assert float(noise_bins.mean()) < 0.1  # independent noise: incoherent


def test_cross_psd_degenerates_to_welch_psd():
    x, _, fs = _pair(T=1 << 14)
    f1, pxx = cross_psd(x, x, fs, window=512)
    f2, psd = welch_psd(x, fs, window=512)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(
        np.asarray(pxx).real, np.asarray(psd), rtol=2e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(pxx).imag, 0.0, atol=1e-7)


def test_coherence_is_jittable_cross_psd_is_not():
    import jax

    rng = np.random.default_rng(1)
    x = rng.standard_normal(8192).astype(np.float32)
    y = rng.standard_normal(8192).astype(np.float32)
    jitted = jax.jit(lambda a, b: coherence(a, b, 500.0, window=512)[1])
    np.testing.assert_allclose(
        np.asarray(jitted(x, y)),
        np.asarray(coherence(x, y, 500.0, window=512)[1]),
        rtol=1e-5, atol=1e-7,  # outer-jit refusion moves f32 ulps
    )
    # cross_psd documents its host-numpy return: not jittable by design.
    with pytest.raises(jax.errors.TracerArrayConversionError):
        jax.jit(lambda a, b: cross_psd(a, b, 500.0, window=512)[1])(x, y)


def test_validation():
    x, y, fs = _pair(T=4096)
    with pytest.raises(ValueError, match="shapes differ"):
        cross_psd(x, y[:-1], fs, window=512)
    with pytest.raises(ValueError, match="unknown taper"):
        coherence(x, y, fs, window=512, taper="tukey")
    with pytest.raises(ValueError, match="unknown detrend"):
        cross_psd(x, y, fs, window=512, detrend="linear")


def test_coherence_with_phase_single_pass_consistency():
    """(freqs, cxy, phase) match separate coherence() + cross_psd() calls."""
    import numpy as np

    from apda_fft_tpu.models.streaming import (
        coherence, coherence_with_phase, cross_psd,
    )

    rng = np.random.default_rng(21)
    fs, n = 500.0, 8192
    t = np.arange(n) / fs
    shared = np.sin(2 * np.pi * 40.0 * t)
    x = shared + 0.5 * rng.standard_normal(n)
    y = 0.8 * np.sin(2 * np.pi * 40.0 * t - np.pi / 4) + 0.5 * rng.standard_normal(n)

    f1, cxy1, phase = coherence_with_phase(x, y, fs, 1024)
    f2, cxy2 = coherence(x, y, fs, 1024)
    _, pxy = cross_psd(x, y, fs, 1024)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(cxy1), np.asarray(cxy2), atol=1e-6)
    b = int(round(40.0 * 1024 / fs))  # window 1024 -> n_fft 1024, H=512
    assert float(cxy1[b]) > 0.9
    # Phase agrees with the complex cross-PSD's angle (scale-invariant).
    np.testing.assert_allclose(
        float(np.asarray(phase)[b]), np.degrees(np.angle(pxy[b])), atol=0.1
    )
    assert float(np.asarray(phase)[b]) == pytest.approx(-45.0, abs=5.0)


def test_coherence_zero_channel_is_clean():
    """An identically-zero channel yields cxy 0 everywhere, no warnings."""
    import warnings

    import numpy as np

    from apda_fft_tpu.models.streaming import coherence_with_phase

    x = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
    z = np.zeros(4096, np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, cxy, _ = coherence_with_phase(x, z, 500.0, 1024)
    assert float(np.max(np.asarray(cxy))) == 0.0
