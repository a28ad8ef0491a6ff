"""Unit coverage for analyze_epoch's lowlat routing decisions.

The routing itself requires ``jax.default_backend() == "tpu"``, so these
tests monkeypatch the backend probe and swap the kernel for a counting
wrapper running in interpret mode - covering on CPU the decision logic the
on-hardware suite (routed-vs-unrouted 24/24, parity gate lowlat section)
validates end to end.
"""

import jax
import numpy as np
import pytest

import apda_fft_tpu.models.pipeline as P
import apda_fft_tpu.ops.latency_pallas as L
from apda_fft_tpu.models.pipeline import analyze_epoch


@pytest.fixture
def fake_tpu(monkeypatch):
    """Pretend to be a TPU host; count kernel dispatches; isolate budgets."""
    calls = []
    real = L.analyze_window_lowlat

    def counting_kernel(*args, **kwargs):
        calls.append(kwargs.get("max_candidates"))
        return real(*args, **kwargs, interpret=True)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(L, "analyze_window_lowlat", counting_kernel)
    # The faked backend would also engage the fused-detector route, whose
    # kernel would then run un-interpreted on CPU; pin it off - these tests
    # cover the LOWLAT routing decisions (test_detector_fused.py covers the
    # fused route with its own interpret-mode spy).
    monkeypatch.setenv("APDA_FUSED_DETECTOR", "0")
    saved_budget, saved_hwm = dict(P._dynamic_budget), dict(P._dynamic_budget_hwm)
    P._dynamic_budget.clear()
    P._dynamic_budget_hwm.clear()
    yield calls
    P._dynamic_budget.clear()
    P._dynamic_budget_hwm.clear()
    P._dynamic_budget.update(saved_budget)
    P._dynamic_budget_hwm.update(saved_hwm)


def _modal(n, fs=500.0, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = (
        np.sin(2 * np.pi * 0.025 * fs * t)
        + 0.6 * np.sin(2 * np.pi * 0.095 * fs * t)
        + 0.05 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


@pytest.mark.parametrize("mode", ["rigid", "flexible"])
def test_single_full_window_routes_through_kernel(fake_tpu, mode):
    x = _modal(1024)
    routed = analyze_epoch(x[None], 500.0, mode=mode)
    n_routed_calls = len(fake_tpu)
    assert n_routed_calls >= 1
    unrouted = analyze_epoch(x[None], 500.0, mode=mode, lowlat="never")
    assert len(fake_tpu) == n_routed_calls  # "never" added no dispatches
    assert int(routed.count[0]) == int(unrouted.count[0])
    assert np.array_equal(np.asarray(routed.idx[0]), np.asarray(unrouted.idx[0]))


def test_lowlat_never_skips_kernel(fake_tpu):
    x = _modal(1024)
    analyze_epoch(x[None], 500.0, mode="flexible", lowlat="never")
    assert fake_tpu == []


def test_sticky_budget_past_cap_skips_kernel_attempt(fake_tpu):
    # A sticky budget past the 64-slot kernel cap proves the kernel result
    # would be discarded; the routing must not pay the dispatch + readback.
    P._dynamic_budget[(1024, "flexible")] = 128
    x = _modal(1024)
    analyze_epoch(x[None], 500.0, mode="flexible")
    assert fake_tpu == []


def test_overflow_past_cap_falls_back_to_batched(fake_tpu):
    # 71 bin-exact tones above bin 1000: every candidate fails the damping
    # floor (damping = 100/j % < 0.1%), so the walk never completes and
    # n_required = n_candidates = 71 > the 64-slot kernel cap.  The kernel
    # reports that, the routing discards its result, and the batched dynamic
    # path re-runs - decisions must match lowlat="never".
    fs, n = 500.0, 4096
    t = np.arange(n) / fs
    x = sum(
        np.sin(2 * np.pi * (b * fs / n) * t) for b in range(1100, 1313, 3)
    ).astype(np.float32)
    routed = analyze_epoch(x[None], fs, mode="flexible")
    assert len(fake_tpu) >= 1
    assert P._dynamic_budget[(4096, "flexible")] > 64
    unrouted = analyze_epoch(x[None], fs, mode="flexible", lowlat="never")
    assert int(routed.count[0]) == int(unrouted.count[0])
    assert np.array_equal(np.asarray(routed.idx[0]), np.asarray(unrouted.idx[0]))


def test_early_complete_walk_keeps_kernel_result_past_candidate_overflow(fake_tpu):
    # Noise window with 72 pre-budget candidates whose greedy walk still
    # completes within the first few magnitude-ordered slots: n_required is
    # small, so the kernel result is exact and the routing keeps it instead
    # of re-running the batched path (the n_required optimization).  The
    # sticky budget stays at the floor - noisy windows no longer poison it.
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4096).astype(np.float32)
    routed = analyze_epoch(x[None], 500.0, mode="flexible")
    assert len(fake_tpu) >= 1
    assert int(np.max(np.asarray(routed.n_candidates))) > 64
    assert P._dynamic_budget[(4096, "flexible")] <= 64
    unrouted = analyze_epoch(x[None], 500.0, mode="flexible", lowlat="never")
    assert int(routed.count[0]) == int(unrouted.count[0])
    assert np.array_equal(np.asarray(routed.idx[0]), np.asarray(unrouted.idx[0]))


def test_adaptive_forwards_lowlat_never(fake_tpu):
    x = _modal(1024)
    res = analyze_epoch(x[None], 500.0, mode="adaptive", lowlat="never")
    assert fake_tpu == []
    assert int(res.count[0]) > 0


def test_adaptive_auto_routes_inner_flexible(fake_tpu):
    x = _modal(1024)
    res = analyze_epoch(x[None], 500.0, mode="adaptive")
    assert len(fake_tpu) >= 1
    assert int(res.count[0]) > 0


def test_batched_epochs_never_route(fake_tpu):
    x = np.stack([_modal(1024, seed=s) for s in range(3)])
    analyze_epoch(x, 500.0, mode="flexible")
    assert fake_tpu == []
