"""Fuzz parity: raw random spectra straight into the detectors vs the oracle.

The modal-signal corpus exercises realistic spectra; this feeds *adversarial
magnitude vectors* (plateaus, exact ties, monotone ramps, zero runs, isolated
spikes) into both detectors and demands exact decision agreement with the
float64 oracle.  Magnitudes are pre-quantized to float32 so both sides compare
identical values (all seeds deterministic).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from apda_fft_tpu.ops.peaks_prominence import prominence_peaks
from apda_fft_tpu.ops.peaks_resolution import resolution_peaks
from tests.oracle import oracle_prominence_peaks, oracle_resolution_peaks


def _random_mags(rng, h):
    kind = rng.integers(0, 5)
    m = rng.uniform(0, 1, h)
    if kind == 1:  # spikes on noise
        for j in rng.integers(1, h - 1, size=rng.integers(1, 8)):
            m[j] = rng.uniform(5, 50)
    elif kind == 2:  # plateaus and exact ties
        for _ in range(4):
            a = int(rng.integers(0, h - 6))
            m[a : a + int(rng.integers(2, 6))] = rng.uniform(0, 10)
        for j in rng.integers(1, h - 1, size=4):
            m[j] = 7.5
    elif kind == 3:  # monotone ramps with notches
        m = np.linspace(0, rng.uniform(1, 20), h)
        m[rng.integers(1, h - 1, size=6)] = 0.0
    elif kind == 4:  # mostly zero with a few peaks
        m = np.zeros(h)
        for j in rng.integers(1, h - 1, size=5):
            m[j] = rng.uniform(1, 30)
    m[0] = 0.0
    return m.astype(np.float32).astype(np.float64)


def _spec_from_mags(mags):
    """Complex vector of length 2H whose |.| over the first half equals mags."""
    full = np.zeros(2 * len(mags), dtype=np.complex128)
    full[: len(mags)] = mags
    return full


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_prominence(seed):
    rng = np.random.default_rng(1000 + seed)
    h = int(rng.choice([64, 256, 1024]))
    mags = _random_mags(rng, h)
    fs = float(rng.choice([31.25, 62.5, 125.0, 250.0, 500.0]))
    ref = oracle_prominence_peaks(_spec_from_mags(mags), fs)
    got = prominence_peaks(jnp.asarray(mags, jnp.float32), fs, 2 * h)
    got_idx = [int(i) for i in np.asarray(got.idx)[: int(got.count)]]
    assert got_idx == [p["idx"] for p in ref], (seed, h, fs)


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_resolution(seed):
    rng = np.random.default_rng(2000 + seed)
    h = int(rng.choice([64, 256, 1024]))
    mags = _random_mags(rng, h)
    fs = float(rng.choice([31.25, 62.5, 125.0, 250.0, 500.0]))
    ref = oracle_resolution_peaks(_spec_from_mags(mags), fs)
    got = resolution_peaks(jnp.asarray(mags, jnp.float32), fs, 2 * h)
    got_idx = [int(i) for i in np.asarray(got.idx)[: int(got.count)]]
    assert got_idx == [p["idx"] for p in ref], (seed, h, fs)


@pytest.mark.slow
def test_dynamic_budget_always_matches_unbounded():
    """Property sweep: across signal families and sizes, the dynamic default
    must decide identically to a huge static budget, and the sticky cache
    must survive interleaved quiet/noisy epochs (shrink + regrow + re-run)."""
    import jax.numpy as jnp

    from apda_fft_tpu.models import pipeline as P
    from apda_fft_tpu.models.pipeline import analyze_epoch

    rng = np.random.default_rng(11)
    P._dynamic_budget.clear()
    cases = []
    for n, fs in ((1024, 500.0), (2048, 125.0), (4096, 500.0)):
        t = np.arange(n) / fs
        quiet = np.sin(2 * np.pi * 0.11 * fs * t) + 0.02 * rng.standard_normal(n)
        noisy = rng.standard_normal(n)
        multi = sum(
            a * np.sin(2 * np.pi * f * fs * t)
            for a, f in ((1.0, 0.05), (0.7, 0.13), (0.5, 0.21), (0.3, 0.34))
        ) + 0.1 * rng.standard_normal(n)
        # interleave classes to exercise budget shrink/grow transitions
        for sig in (quiet, noisy, quiet, multi, noisy):
            cases.append((n, fs, sig.astype(np.float32)))

    for mode in ("flexible", "adaptive"):
        for n, fs, sig in cases:
            dyn = analyze_epoch(sig[None, :], fs, mode=mode)
            big = analyze_epoch(sig[None, :], fs, mode=mode, max_candidates=n // 2)
            for name, a, b in zip(dyn._fields, dyn, big):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (mode, n, name)
