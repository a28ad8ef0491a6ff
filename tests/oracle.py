"""Float64 reference-semantics oracle for golden tests (clean-room, pure host).

This module re-states the APDA-FFT numerical contract (see SURVEY.md section 2
"Numerical contract") in plain NumPy + ``statistics`` so device results can be
checked against an exact, independently written model:

* spectrum: median-centering, zero-pad to next power of two, FFT, DC bin
  zeroed afterwards (contract of ``metrics/fft_iterativa.py:74-88``).  The
  transform itself is ``numpy.fft.fft``; the reference's own radix-2 loop
  agrees with numpy to <=1e-12 relative (measured, BASELINE.md), far below
  every decision threshold in the detectors.
* ``statistics.mean`` / ``statistics.stdev`` / ``statistics.median`` are used
  exactly where the reference uses them, because the ``statistics`` module
  computes with exact rationals and can differ from numpy reductions in the
  last ulp.
* both detectors follow the reference's control flow decision-for-decision
  (documented inline against ``utils/get_peak_prominence.py`` and
  ``utils/get_peak_resolution.py``).
"""

from __future__ import annotations

import statistics

import numpy as np

# ---------------------------------------------------------------------------
# Spectrum
# ---------------------------------------------------------------------------


def oracle_spectrum(samples) -> np.ndarray:
    """Median-center, pad to pow2, FFT, zero DC (``fft_iterativa.py:74-88``)."""
    xs = [float(v) for v in samples]
    med = statistics.median(xs)
    centered = [v - med for v in xs]
    n = 1
    while n < len(centered):
        n <<= 1
    padded = centered + [0.0] * (n - len(centered))
    spec = np.fft.fft(np.asarray(padded, dtype=np.float64))
    spec[0] = 0.0
    return spec


def half_magnitudes(spec: np.ndarray) -> list[float]:
    """Positive-frequency magnitude list as both detectors build it."""
    half = len(spec) // 2
    return [float(abs(spec[i])) for i in range(half)]


def _threshold(mags: list[float]) -> tuple[float, float]:
    avg = statistics.mean(mags)
    std = statistics.stdev(mags)
    return avg + 2.0 * std, std


# ---------------------------------------------------------------------------
# Prominence detector (flexible structures)
# ---------------------------------------------------------------------------


def _flank_valley(mags: list[float], j: int, step: int) -> float:
    """Shallowest point scanning from j outward, stopping at the first sample
    strictly above the peak (``get_peak_prominence.py:32-54``)."""
    peak = mags[j]
    best = peak
    i = j + step
    while 0 <= i < len(mags):
        if mags[i] > peak:
            break
        if mags[i] < best:
            best = mags[i]
        i += step
    return best


def _half_power_bins(mags: list[float], j: int, prom: float) -> int:
    """Prominence-relative -3 dB width in bins (``get_peak_prominence.py:89-112``)."""
    peak = mags[j]
    target = (peak - prom) + prom * 0.707
    li = j
    while li > 0 and mags[li] > target:
        if mags[li] > peak:
            break
        li -= 1
    ri = j
    while ri < len(mags) - 1 and mags[ri] > target:
        if mags[ri] > peak:
            break
        ri += 1
    return max(ri - li, 1)


def oracle_prominence_peaks(spec: np.ndarray, fs: float, k: int = 4) -> list[dict]:
    """Decision-exact model of ``get_top_peaks_prominence`` (``:149-226``)."""
    n = len(spec)
    mags = half_magnitudes(spec)
    half = len(mags)
    ds = fs / n
    threshold, std = _threshold(mags)

    cands = []
    for j in range(1, half - 1):
        if not (mags[j] > mags[j - 1] and mags[j] > mags[j + 1] and mags[j] > threshold):
            continue
        prom = mags[j] - max(_flank_valley(mags, j, -1), _flank_valley(mags, j, +1))
        if not prom > 0.5 * std:
            continue
        width = _half_power_bins(mags, j, prom) * ds
        if not width > 0:
            continue
        fn = j * ds
        q = fn / width
        damping = 1.0 / (2.0 * q)
        if not (0.001 <= damping <= 0.07):
            continue
        cands.append(
            {
                "freq": round(fn, 4),
                "mag": round(mags[j], 4),
                "prominence": prom,
                "damping": round(damping * 100.0, 2),
                "q-factor": round(q, 2),
                "idx": j,
            }
        )

    cands.sort(key=lambda c: c["mag"], reverse=True)  # stable, like sorted()

    final: list[dict] = []
    for c in cands:
        shoulder = False
        for a in final:
            if abs(c["freq"] - a["freq"]) / a["freq"] < 0.05:
                if c["prominence"] / c["mag"] < 0.10:
                    shoulder = True
                    break
        if not shoulder:
            final.append(c)
        if len(final) >= k:
            break
    return final


# ---------------------------------------------------------------------------
# Resolution detector (rigid structures)
# ---------------------------------------------------------------------------


def _abs_width(mags: list[float], j: int) -> int:
    """Absolute -3 dB width in bins (``get_peak_resolution.py:30-44``)."""
    half_max = 0.707 * mags[j]
    li = j
    while li > 0 and mags[li] > half_max:
        li -= 1
    ri = j
    while ri < len(mags) and mags[ri] > half_max:
        ri += 1
    return ri - li


def _resolution(mags: list[float], i1: int, i2: int) -> float:
    """Rayleigh-like separability score (``get_peak_resolution.py:48-62``)."""
    w = _abs_width(mags, i1) + _abs_width(mags, i2)
    if w == 0:
        return 0.0
    return 1.18 * abs(i2 - i1) / w


def oracle_resolution_peaks(spec: np.ndarray, fs: float, k: int = 5) -> list[dict]:
    """Decision-exact model of ``get_top_peaks_resolution`` (``:80-128``)."""
    n = len(spec)
    mags = half_magnitudes(spec)
    half = len(mags)
    ds = fs / n
    frequencies = [i * ds for i in range(half)]
    threshold, _ = _threshold(mags)

    peaks: list[dict] = []
    while len(peaks) < k:
        best_val, best_idx = -1.0, -1
        for j in range(1, half - 1):
            if mags[j] > mags[j - 1] and mags[j] > mags[j + 1]:
                if mags[j] > best_val and mags[j] > threshold:
                    best_val, best_idx = mags[j], j
        if best_idx == -1:
            break

        freq = best_idx * ds
        if all(_resolution(mags, p["idx"], best_idx) >= 1.5 for p in peaks):
            peaks.append({"freq": freq, "mag": best_val, "idx": best_idx})

        distance = frequencies[2] - frequencies[1]
        discard = round((freq * 0.02) / distance)
        for j in range(max(0, best_idx - discard), min(half, best_idx + discard + 1)):
            mags[j] = 0.0
    return peaks


def oracle_analyze(samples, fs: float, mode: str = "flexible"):
    """Full reference pipeline for one window: spectrum + chosen detector.

    ``adaptive`` composes the pipeline's per-window fallback (BASELINE
    config 2, ``models/pipeline.py _detect_from_mags``): the prominence
    detector's result when it accepts at least one peak, else the
    resolution detector's.
    """
    spec = oracle_spectrum(samples)
    if mode == "flexible":
        return oracle_prominence_peaks(spec, fs)
    if mode == "adaptive":
        flex = oracle_prominence_peaks(spec, fs)
        if flex:
            return flex
        # The pipeline's adaptive fallback runs in the prominence result's
        # k=4 slots; the resolution walk is greedy (accept order = slot
        # order), so its k=5 list truncated to 4 IS the k=4 run.
        return oracle_resolution_peaks(spec, fs)[:4]
    return oracle_resolution_peaks(spec, fs)
