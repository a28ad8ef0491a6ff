"""analyze_epochs_pipelined: deferred dynamic-budget validation in a stream."""

import numpy as np
import pytest

import apda_fft_tpu.models.pipeline as P
from apda_fft_tpu.models.pipeline import analyze_epoch
from apda_fft_tpu.models.streaming import analyze_epochs_pipelined


@pytest.fixture(autouse=True)
def clean_budget_table():
    saved_b, saved_h = dict(P._dynamic_budget), dict(P._dynamic_budget_hwm)
    P._dynamic_budget.clear()
    P._dynamic_budget_hwm.clear()
    yield
    P._dynamic_budget.clear()
    P._dynamic_budget_hwm.clear()
    P._dynamic_budget.update(saved_b)
    P._dynamic_budget_hwm.update(saved_h)


def _epochs(n=1024, fs=500.0):
    rng = np.random.default_rng(11)
    t = np.arange(n) / fs
    modal = (
        np.sin(2 * np.pi * 0.025 * fs * t)
        + 0.6 * np.sin(2 * np.pi * 0.095 * fs * t)
        + 0.05 * rng.standard_normal((3, n))
    ).astype(np.float32)
    noise = rng.standard_normal((2, n)).astype(np.float32)  # budget-overflowing
    sparse = np.zeros((1, n), np.float32)
    sparse[0, rng.integers(0, n, 8)] = 5.0
    return [modal, noise, sparse, modal[:1]]


@pytest.mark.parametrize("mode", ["flexible", "rigid"])
@pytest.mark.parametrize("depth", [1, 3, 16])
def test_matches_sequential_dynamic(mode, depth):
    fs = 500.0
    epochs = _epochs()
    got = list(analyze_epochs_pipelined(epochs, fs, depth=depth, mode=mode))
    assert len(got) == len(epochs)
    for samples, res in zip(epochs, got):
        ref = analyze_epoch(samples, fs, mode=mode)
        assert np.array_equal(np.asarray(res.count), np.asarray(ref.count))
        assert np.array_equal(np.asarray(res.idx), np.asarray(ref.idx))
        np.testing.assert_array_equal(np.asarray(res.freq), np.asarray(ref.freq))


def test_sticky_budget_learns_from_overflow():
    fs = 500.0
    epochs = _epochs()
    list(analyze_epochs_pipelined(epochs, fs, mode="flexible"))
    # The noise epoch overflows the floor budget; the high-water mark must
    # have grown past it (the sticky budget itself intentionally re-tracks
    # each epoch's need, same contract as the sequential dynamic path).
    assert P._dynamic_budget_hwm[(1024, "flexible")] > P._DYNAMIC_FLOOR


def test_results_yield_in_input_order_lazily():
    fs = 500.0
    epochs = _epochs()
    gen = analyze_epochs_pipelined(iter(epochs), fs, depth=2)
    first = next(gen)
    assert first.count.shape == (3,)  # the modal [3, n] epoch comes first
    rest = list(gen)
    assert len(rest) == len(epochs) - 1


def test_mixed_sizes_use_per_epoch_n_fft():
    fs = 500.0
    rng = np.random.default_rng(5)
    epochs = [rng.standard_normal((2, n)).astype(np.float32) for n in (1024, 4096)]
    got = list(analyze_epochs_pipelined(epochs, fs))
    assert got[0].idx.shape == got[1].idx.shape  # same k slots
    assert (1024, "flexible") in P._dynamic_budget
    assert (4096, "flexible") in P._dynamic_budget


def test_composes_with_sharded_analyze():
    import functools

    from apda_fft_tpu.parallel.mesh import analyze_epoch_sharded, make_mesh

    fs = 500.0
    mesh = make_mesh(8, ("data",))
    sharded = functools.partial(analyze_epoch_sharded, mesh=mesh)
    epochs = _epochs()
    got = list(analyze_epochs_pipelined(epochs, fs, depth=2, analyze=sharded))
    for samples, res in zip(epochs, got):
        ref = analyze_epoch(samples, fs, mode="flexible")
        assert np.array_equal(np.asarray(res.count), np.asarray(ref.count))
        assert np.array_equal(np.asarray(res.idx), np.asarray(ref.idx))


def test_validation_errors_raise_eagerly_at_call_site():
    # No iteration: misconfiguration must fail at the call, not first next().
    with pytest.raises(ValueError, match="flexible.*rigid"):
        analyze_epochs_pipelined([], 500.0, mode="adaptive")
    with pytest.raises(ValueError, match="candidate budget"):
        analyze_epochs_pipelined([], 500.0, max_candidates=8)
    with pytest.raises(ValueError, match="depth"):
        analyze_epochs_pipelined([], 500.0, depth=0)
    with pytest.raises(ValueError, match="lengths"):
        analyze_epochs_pipelined([], 500.0, lengths=np.array([4]))
    assert list(analyze_epochs_pipelined([], 500.0)) == []


def test_at_most_depth_in_flight():
    # Clean modal epochs (no budget overflow, so every analyze call is a
    # dispatch and every yield retires exactly one).
    fs, depth = 500.0, 2
    n = 1024
    t = np.arange(n) / fs
    epochs = [
        (np.sin(2 * np.pi * 0.025 * fs * t) * (1 + 0.1 * s)).astype(np.float32)[None]
        for s in range(5)
    ]
    outstanding = 0
    seen_max = 0

    def counting_analyze(samples, f, **kw):
        nonlocal outstanding, seen_max
        outstanding += 1
        seen_max = max(seen_max, outstanding)
        return analyze_epoch(samples, f, **kw)

    for _ in analyze_epochs_pipelined(epochs, fs, depth=depth, analyze=counting_analyze):
        outstanding -= 1  # each yield retires the oldest dispatch
    assert seen_max == depth
