"""Synthetic structural-monitoring signals with known modal content."""

from __future__ import annotations

import numpy as np


def modal_signal(
    n: int,
    fs: float,
    modes: list[tuple[float, float, float]] | None = None,
    noise: float = 0.05,
    dc: float = 0.1,
    seed: int = 0,
) -> np.ndarray:
    """Sum of lightly damped sinusoids + gaussian noise + DC offset.

    ``modes`` is a list of (frequency_hz, amplitude, damping_ratio); damping
    ratios in the detector's acceptance band [0.001, 0.07] give half-power
    widths the prominence detector will accept.
    """
    rng = np.random.default_rng(seed)
    if modes is None:
        n_modes = int(rng.integers(1, 5))
        modes = [
            (
                float(rng.uniform(0.06, 0.85) * (fs / 2)),
                float(rng.uniform(0.5, 2.0)),
                float(rng.uniform(0.004, 0.04)),
            )
            for _ in range(n_modes)
        ]
    t = np.arange(n, dtype=np.float64) / fs
    x = np.full(n, dc, dtype=np.float64)
    for f, a, zeta in modes:
        phase = rng.uniform(0, 2 * np.pi)
        x += a * np.sin(2 * np.pi * f * t + phase) * np.exp(-zeta * 2 * np.pi * f * t)
    x += noise * rng.standard_normal(n)
    return x


def two_mode_signal(n: int, fs: float, seed: int = 42) -> np.ndarray:
    """The BASELINE.md measurement signal: 12.3 Hz + 47.7 Hz + noise."""
    return modal_signal(
        n, fs, modes=[(12.3, 1.0, 0.0), (47.7, 0.6, 0.0)], noise=0.05, seed=seed
    )
