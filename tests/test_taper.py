"""Spectral-leakage tapers (beyond-reference): taper_window + analyze_epoch(taper=...)."""

import numpy as np
import pytest

from apda_fft_tpu.models.pipeline import analyze_epoch
from apda_fft_tpu.ops.fft import TAPERS, halfspec_magnitudes, taper_window


def test_matches_numpy_window_definitions():
    n = 512
    for name, np_fn in (("hann", np.hanning), ("hamming", np.hamming),
                        ("blackman", np.blackman)):
        w = np.asarray(taper_window(name, n, np.float64))
        ref = np_fn(n)
        ref = ref / ref.mean()  # coherent-gain normalization
        np.testing.assert_allclose(w, ref, rtol=1e-12, atol=1e-12)


def test_ragged_lengths_span_valid_prefix():
    n, L = 256, 100
    w = np.asarray(taper_window("hann", n, np.float64, lengths=np.asarray([L, n])))
    assert w.shape == (2, n)
    ref = np.hanning(L)
    np.testing.assert_allclose(w[0, :L], ref / ref.mean(), rtol=1e-12)
    assert np.all(w[0, L:] == 0.0)
    full = np.hanning(n)
    np.testing.assert_allclose(w[1], full / full.mean(), rtol=1e-12)


def test_validation():
    with pytest.raises(ValueError, match="unknown taper"):
        taper_window("kaiser", 64, np.float32)
    with pytest.raises(ValueError, match="skip tapering"):
        taper_window("none", 64, np.float32)
    x = np.zeros((1, 256), np.float32)
    with pytest.raises(ValueError, match="unknown taper"):
        analyze_epoch(x, 500.0, taper="kaiser")


def test_default_none_is_reference_path():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    a = analyze_epoch(x, 500.0)
    b = analyze_epoch(x, 500.0, taper="none")
    assert np.array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.mag), np.asarray(b.mag))


def test_hann_suppresses_leakage_skirt():
    # A strong off-bin tone (worst-case half-bin offset) next to a weak tone
    # 40 dB down, 30 bins away: the rectangular window's leakage skirt
    # buries the weak tone (measured: tone 29.4 on a 22.2 floor); hann's
    # -31 dB sidelobes expose it (tone 20.5 on a 1.06 floor).
    import jax.numpy as jnp

    n, fs = 4096, 500.0
    df = fs / n
    t = np.arange(n) / fs
    x = (np.sin(2 * np.pi * ((300 + 0.5) * df) * t)
         + 0.01 * np.sin(2 * np.pi * (330 * df) * t)).astype(np.float32)[None]

    skirt = list(range(320, 330)) + list(range(331, 341))
    rect = np.asarray(halfspec_magnitudes(jnp.asarray(x), backend="matmul"))[0]
    xw = jnp.asarray(x) * taper_window("hann", n, np.float32)
    hann = np.asarray(halfspec_magnitudes(xw, backend="matmul"))[0]

    assert rect[330] < 2 * rect[skirt].mean()    # buried in rect leakage
    assert hann[330] > 10 * hann[skirt].mean()   # exposed under hann
    assert hann[skirt].mean() < rect[skirt].mean() / 10

    # End-to-end: a 330-bin tone strong enough to clear the noise threshold
    # is reported alongside the off-bin neighbor when tapered.
    x2 = (np.sin(2 * np.pi * ((300 + 0.5) * df) * t)
          + 0.12 * np.sin(2 * np.pi * (330 * df) * t)).astype(np.float32)[None]
    res = analyze_epoch(x2, fs, mode="flexible", taper="hann")
    got = set(int(i) for i in np.asarray(res.idx[0])[: int(res.count[0])])
    assert 330 in got


def test_on_bin_magnitude_preserved_by_normalization():
    n, fs = 1024, 500.0
    t = np.arange(n) / fs
    f = 100 * (fs / n)
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    none = analyze_epoch(x, fs, taper="none")
    hann = analyze_epoch(x, fs, taper="hann")
    assert int(none.idx[0][0]) == int(hann.idx[0][0]) == 100
    np.testing.assert_allclose(
        float(hann.mag[0][0]), float(none.mag[0][0]), rtol=0.01
    )


def test_taper_with_padded_windows_spans_data_length():
    # L=1000 samples padded to n_fft=1024: the taper must span the 1000
    # data samples (handled via the static-length path).
    n, fs, L = 1024, 500.0, 1000
    t = np.arange(L) / fs
    x = np.sin(2 * np.pi * 48.83 * t).astype(np.float32)[None]
    res = analyze_epoch(x, fs, n_fft=n, taper="hann")
    assert int(res.count[0]) >= 1
    got = int(res.idx[0][0])
    assert abs(got - round(48.83 * n / fs)) <= 1


def test_all_tapers_run_all_modes():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 512)).astype(np.float32)
    for taper in TAPERS:
        for mode in ("flexible", "rigid", "adaptive"):
            res = analyze_epoch(x, 500.0, mode=mode, taper=taper)
            assert res.idx.shape == (2, 5 if mode == "rigid" else 4)
