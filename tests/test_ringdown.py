"""Free-decay log-decrement damping estimation."""

import numpy as np
import pytest

from apda_fft_tpu.ops.ringdown import ringdown_damping


def _decay(zeta, f0=20.0, fs=500.0, n=2048, noise=0.0, seed=0, f2=None):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    w0 = 2 * np.pi * f0
    x = np.exp(-zeta * w0 * t) * np.sin(w0 * np.sqrt(1 - zeta**2) * t)
    if f2 is not None:
        x = x + 0.5 * np.exp(-0.05 * 2 * np.pi * f2 * t) * np.sin(2 * np.pi * f2 * t)
    return (x + noise * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("zeta", [0.005, 0.01, 0.02, 0.05])
def test_recovers_known_damping(zeta):
    got = float(ringdown_damping(_decay(zeta), 500.0, 20.0))
    assert got == pytest.approx(zeta, rel=0.10)


def test_band_selection_isolates_the_mode():
    # A second, more-damped mode at 80 Hz must not bias the 20 Hz estimate.
    x = _decay(0.01, f2=80.0)
    got = float(ringdown_damping(x, 500.0, 20.0))
    assert got == pytest.approx(0.01, rel=0.15)
    got2 = float(ringdown_damping(x, 500.0, 80.0))
    assert got2 == pytest.approx(0.05, rel=0.25)


def test_noise_robustness():
    got = float(ringdown_damping(_decay(0.02, noise=0.02), 500.0, 20.0))
    assert got == pytest.approx(0.02, rel=0.25)


def test_near_nyquist_band_is_clamped():
    # Regression: with fs=500 and f0=230, the default band (276 Hz top)
    # used to pull conjugate bins past Nyquist into the analytic signal
    # and return a silently 4x-biased estimate.
    x = _decay(0.02, f0=230.0, fs=500.0)
    got = float(ringdown_damping(x, 500.0, 230.0))
    assert got == pytest.approx(0.02, rel=0.15)


def test_batched_f0_per_row():
    # Regression: documented batch-shaped f0 used to crash ([B]) or return
    # a [B, B] cross-product ([B, 1]).
    xs = np.stack([_decay(0.01, f0=20.0), _decay(0.03, f0=80.0)])
    z = np.asarray(ringdown_damping(xs, 500.0, np.array([20.0, 80.0])))
    assert z.shape == (2,)
    assert z[0] == pytest.approx(0.01, rel=0.1)
    assert z[1] == pytest.approx(0.03, rel=0.1)


def test_batched_and_short_window_nan():
    xs = np.stack([_decay(0.01), _decay(0.03)])
    z = np.asarray(ringdown_damping(xs, 500.0, 20.0))
    assert z.shape == (2,)
    assert z[0] == pytest.approx(0.01, rel=0.1)
    assert z[1] == pytest.approx(0.03, rel=0.1)
    # A heavily-damped transient with too few cycles in the window -> NaN.
    short = _decay(0.40, n=64)
    assert np.isnan(float(ringdown_damping(short, 500.0, 20.0)))
