"""Fused single-window latency kernel vs the batched XLA pipeline.

The kernels run in interpreter mode on the CPU test platform; on-hardware
equivalence and the latency numbers are covered by benchmarks
(docs/DESIGN.md "Single-window fused kernel").
"""

import numpy as np
import pytest

from apda_fft_tpu.models.pipeline import analyze_epoch
from apda_fft_tpu.ops.latency_pallas import analyze_window_lowlat


def _window(n, fs, seed, kind="modal"):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    if kind == "modal":
        x = (
            np.sin(2 * np.pi * 0.025 * fs * t)
            + 0.6 * np.sin(2 * np.pi * 0.095 * fs * t)
            + 0.05 * rng.standard_normal(n)
            + 3.0
        )
    elif kind == "noise":
        x = rng.standard_normal(n)
    else:  # sparse impulses
        x = np.zeros(n)
        x[rng.integers(0, n, 8)] = 5.0 * rng.standard_normal(8)
    return x.astype(np.float32)


@pytest.mark.parametrize("mode", ["rigid", "flexible"])
@pytest.mark.parametrize("kind", ["modal", "noise", "impulse"])
def test_lowlat_matches_batched_pipeline(mode, kind):
    n, fs = 1024, 500.0
    x = _window(n, fs, seed=7, kind=kind)
    lo = analyze_window_lowlat(x, fs, mode=mode, refine=True, max_candidates=16)
    # lowlat="never" pins the batched pipeline even on a TPU host, where the
    # default "auto" would route this exact shape through the kernel and the
    # test would compare the kernel with itself.
    hi = analyze_epoch(
        x[None], fs, n_fft=n, mode=mode, refine=True, max_candidates=16,
        lowlat="never",
    )
    assert int(lo.count[0]) == int(hi.count[0])
    assert np.array_equal(np.asarray(lo.idx[0]), np.asarray(hi.idx[0]))
    np.testing.assert_allclose(np.asarray(lo.freq[0]), np.asarray(hi.freq[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lo.mag[0]), np.asarray(hi.mag[0]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lo.refined_freq[0]), np.asarray(hi.refined_freq[0]), atol=1e-3
    )
    assert int(lo.n_candidates[0]) == int(hi.n_candidates[0])
    if mode == "flexible":
        np.testing.assert_allclose(
            np.asarray(lo.damping[0]), np.asarray(hi.damping[0]), atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(lo.q_factor[0]), np.asarray(hi.q_factor[0]), atol=1e-2
        )


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["rigid", "flexible"])
def test_lowlat_n4096_and_low_fs(mode):
    for n, fs, seed in ((4096, 500.0, 1), (1024, 62.5, 2)):
        x = _window(n, fs, seed=seed)
        lo = analyze_window_lowlat(x, fs, mode=mode, max_candidates=8)
        hi = analyze_epoch(
            x[None], fs, n_fft=n, mode=mode, max_candidates=8, lowlat="never"
        )
        assert int(lo.count[0]) == int(hi.count[0]), (n, fs)
        assert np.array_equal(np.asarray(lo.idx[0]), np.asarray(hi.idx[0])), (n, fs)


def test_lowlat_validation_errors():
    x = np.zeros(1024, np.float32)
    with pytest.raises(ValueError, match="exactly one window"):
        analyze_window_lowlat(np.zeros((2, 1024), np.float32), 500.0)
    with pytest.raises(ValueError, match="full window"):
        analyze_window_lowlat(np.zeros(1000, np.float32), 500.0, n_fft=1024)
    with pytest.raises(ValueError, match="power of two"):
        analyze_window_lowlat(np.zeros(48, np.float32), 500.0, n_fft=48)
    with pytest.raises(ValueError, match="unknown mode"):
        analyze_window_lowlat(x, 500.0, mode="adaptive")


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["rigid", "flexible"])
def test_lowlat_matches_float64_oracle(mode):
    """End-to-end oracle parity for the fused kernel (corpus subset).

    Mirrors tests/test_peaks_match.py for the latency path; the full-corpus
    on-hardware version runs in benchmarks/parity_tpu.py each round.
    """
    from tests.oracle import oracle_analyze
    from tests.signals import modal_signal

    for n, fs, seed in ((1024, 500.0, 0), (4096, 500.0, 3), (2048, 62.5, 6)):
        x = modal_signal(n, fs, seed=seed).astype(np.float32)
        ref = oracle_analyze(x, fs, mode=mode)
        res = analyze_window_lowlat(x, fs, n_fft=n, mode=mode, max_candidates=16)
        assert int(res.n_candidates[0]) <= 16
        got_count = int(res.count[0])
        got_idx = [int(i) for i in np.asarray(res.idx[0])[:got_count]]
        assert got_idx == [p["idx"] for p in ref], (n, fs, seed)


def test_analyze_epoch_lowlat_param():
    """lowlat routing: validated param; inactive on the CPU test platform.

    (The actual routing requires a real TPU backend; routed-vs-unrouted
    equivalence is checked on hardware - docs/DESIGN.md. Here we pin that
    the param is validated and the CPU path is unchanged by it.)
    """
    x = _window(1024, 500.0, seed=11)
    a = analyze_epoch(x[None], 500.0, mode="rigid")
    b = analyze_epoch(x[None], 500.0, mode="rigid", lowlat="never")
    assert int(a.count[0]) == int(b.count[0])
    assert np.array_equal(np.asarray(a.idx[0]), np.asarray(b.idx[0]))
    with pytest.raises(ValueError, match="lowlat"):
        analyze_epoch(x[None], 500.0, lowlat="bogus")


def test_lowlat_budget_overflow_reported():
    # Pure noise has many threshold-crossing maxima; a tiny budget truncates
    # and must report the true pre-budget count for the caller's re-run.
    x = _window(1024, 500.0, seed=3, kind="noise")
    lo = analyze_window_lowlat(x, 500.0, mode="flexible", max_candidates=2)
    assert int(lo.n_candidates[0]) > 2
