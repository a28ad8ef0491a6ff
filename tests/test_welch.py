"""analyze_welch: segment-averaged spectral peak detection (beyond-reference)."""

import numpy as np
import pytest

from apda_fft_tpu.models.streaming import analyze_welch


def _long_record(T=65536, fs=500.0, tone=0.08, noise=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fs
    x = (np.sin(2 * np.pi * 25.0 * t) * tone + noise * rng.standard_normal(T))
    return x.astype(np.float32)


def test_averaging_pulls_tone_from_noise():
    # A tone at -22 dB vs white noise: single-segment detection at N=4096 is
    # at the mercy of the noise floor; 31 averaged segments make it the
    # clear top peak.
    fs = 500.0
    x = _long_record(fs=fs, tone=0.08, noise=1.0)
    res = analyze_welch(x, fs, window=4096)
    assert int(res.count) >= 1
    top = int(np.asarray(res.idx)[0])
    assert abs(top - round(25.0 * 4096 / fs)) <= 1


def test_multichannel_batch_shape():
    fs = 500.0
    x = np.stack([_long_record(T=16384, seed=s) for s in range(3)])
    res = analyze_welch(x, fs, window=2048, mode="rigid")
    assert res.idx.shape == (3, 5)
    assert res.count.shape == (3,)


def test_single_segment_rect_matches_analyze_epoch():
    # One full-length segment, no taper, no overlap: Welch degenerates to
    # the plain epoch pipeline (sqrt(mean of one power) == the magnitude).
    from apda_fft_tpu.models.pipeline import analyze_epoch

    fs = 500.0
    x = _long_record(T=4096, tone=0.5)
    w = analyze_welch(x, fs, window=4096, hop=4096, taper="none")
    e = analyze_epoch(x[None], fs, mode="flexible")
    assert int(w.count) == int(e.count[0])
    assert np.array_equal(np.asarray(w.idx), np.asarray(e.idx[0]))


def test_overlap_default_and_validation():
    fs = 500.0
    x = _long_record(T=8192)
    res = analyze_welch(x, fs, window=1024)  # hop defaults to 512
    assert int(res.count) >= 1
    with pytest.raises(ValueError, match="unknown taper"):
        analyze_welch(x, fs, window=1024, taper="kaiser")
    with pytest.raises(ValueError, match="unknown mode"):
        analyze_welch(x, fs, window=1024, mode="bogus")


def test_spectrogram_shapes_and_tone():
    from apda_fft_tpu.models.streaming import spectrogram

    fs = 500.0
    x = _long_record(T=16384, tone=2.0, noise=0.1)
    freqs, mags = spectrogram(x, fs, window=2048, hop=1024, taper="hann")
    assert mags.shape == ((16384 - 2048) // 1024 + 1, 1024)
    assert freqs.shape == (1024,)
    tone_bin = round(25.0 * 2048 / fs)
    m = np.asarray(mags)
    assert np.all(np.argmax(m, axis=-1) == tone_bin)  # tone in every frame
    assert float(freqs[tone_bin]) == pytest.approx(25.0, abs=float(freqs[1]))
    # Multichannel leading shape passes through.
    x3 = np.stack([x, x, x])
    _, m3 = spectrogram(x3, fs, window=2048)
    assert m3.shape == (3, 8, 1024)
    # Per-channel fs broadcasts; freqs comes back [C, H].
    f2, m2 = spectrogram(x3[:2], np.array([500.0, 250.0]), window=2048)
    assert f2.shape == (2, 1024)
    assert float(f2[1, 100]) == pytest.approx(float(f2[0, 100]) / 2)
    with pytest.raises(ValueError, match="unknown taper"):
        spectrogram(x, fs, window=2048, taper="tukey")


def test_welch_psd_matches_scipy():
    # Same segmenting, same symmetric hann window, mean vs median detrend
    # (negligible on zero-mean noise): the density must track
    # scipy.signal.welch closely away from the (zeroed) DC bin.
    import scipy.signal

    from apda_fft_tpu.models.streaming import welch_psd

    fs, window = 500.0, 1024
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(1 << 16).astype(np.float32)
    freqs, psd = welch_psd(noise, fs, window=window)
    # Ours uses a SYMMETRIC hann (numpy.hanning); hand scipy the same
    # window (its "hann" string default is periodic) for a tight match.
    w_sym = np.hanning(window)
    f_sp, p_sp = scipy.signal.welch(
        noise.astype(np.float64), fs=fs, window=w_sym, nperseg=window,
        noverlap=window // 2, detrend="constant",
    )
    h = window // 2
    np.testing.assert_allclose(np.asarray(freqs), f_sp[:h], rtol=0, atol=1e-5)
    # Default detrend="mean" matches scipy's detrend="constant", so every
    # non-DC bin (incl. bin 1) must agree.
    np.testing.assert_allclose(np.asarray(psd)[1:h], p_sp[1:h], rtol=2e-2)

    # With a strong tone added, the steep leakage skirt shows f32-vs-f64
    # sensitivity pointwise, but integrated power still satisfies Parseval.
    x = (noise + 0.5 * np.sin(2 * np.pi * 50.0 * np.arange(1 << 16) / fs)
         ).astype(np.float32)
    _, psd_t = welch_psd(x, fs, window=window)
    total = float(np.sum(np.asarray(psd_t)[1:h]) * (fs / 1024))
    assert total == pytest.approx(float(np.var(x)), rel=0.05)


def test_detrend_modes_agree_away_from_dc():
    from apda_fft_tpu.models.streaming import analyze_welch, welch_psd

    fs = 500.0
    x = _long_record(T=16384, tone=0.5)
    _, p_med = welch_psd(x, fs, window=2048, detrend="median")
    _, p_mean = welch_psd(x, fs, window=2048, detrend="mean")
    # Identical beyond the DC-adjacent bins the taper leakage reaches.
    np.testing.assert_allclose(
        np.asarray(p_med)[3:], np.asarray(p_mean)[3:], rtol=1e-3
    )
    a = analyze_welch(x, fs, window=2048, detrend="median")
    b = analyze_welch(x, fs, window=2048, detrend="mean")  # the default
    assert np.array_equal(np.asarray(a.idx), np.asarray(b.idx))
    with pytest.raises(ValueError, match="unknown detrend"):
        analyze_welch(x, fs, window=2048, detrend="linear")
    with pytest.raises(ValueError, match="unknown detrend"):
        welch_psd(x, fs, window=2048, detrend="linear")


def test_welch_psd_multichannel_and_rect():
    from apda_fft_tpu.models.streaming import welch_psd

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    freqs, psd = welch_psd(x, 250.0, window=512, taper="none")
    assert psd.shape == (2, 256)
    assert freqs.shape == (256,)
    assert float(psd[0, 0]) == 0.0  # DC zeroed by the front end


def test_segment_front_end_matches_numpy_reference():
    # Independent float64 numpy replication of the documented spec:
    # frame -> median-center -> hann/coherent-gain taper -> |rfft| -> DC=0.
    from apda_fft_tpu.models.streaming import _segment_mags

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    window, hop = 1024, 512
    mags = np.asarray(
        _segment_mags(x, window=window, hop=hop, taper="hann", backend="matmul")
    )
    W = (8192 - window) // hop + 1
    assert mags.shape == (2, W, window // 2)
    wfun = np.hanning(window)
    wfun = wfun / wfun.mean()
    for c in (0, 1):
        for widx in (0, W // 2, W - 1):
            seg = x[c, widx * hop : widx * hop + window].astype(np.float64)
            seg = (seg - np.median(seg)) * wfun
            ref = np.abs(np.fft.rfft(seg))[: window // 2]
            ref[0] = 0.0
            np.testing.assert_allclose(
                mags[c, widx], ref, rtol=5e-4, atol=5e-3
            )


def test_refine_and_adaptive_run():
    fs = 500.0
    x = _long_record(T=16384, tone=0.5)
    res = analyze_welch(x, fs, window=2048, mode="adaptive", refine=True)
    assert int(res.count) >= 1
    assert float(res.refined_freq[0]) == pytest.approx(25.0, abs=0.3)
