"""Synthetic structural-response generator shared by tests/examples/benches.

One canonical implementation of the textbook output-only identification
setup — white-noise-driven SDOF modal coordinates mixed through a mode-shape
matrix — so the validation corpus (tests), the documentation (examples) and
the hardware evidence harness (benchmarks) all exercise the SAME model and
cannot silently diverge.  Host-side numpy by design: this generates *input*
data for the device pipelines.
"""

from __future__ import annotations

import numpy as np


def modal_records(
    shapes,
    freqs_hz,
    zetas,
    fs: float,
    t_sec: float,
    seed: int = 0,
    sensor_noise: float = 0.02,
) -> np.ndarray:
    """``[S, T]`` float32 responses with known modal ground truth.

    Each mode ``(f, zeta)`` is a discretized SDOF resonator — an AR(2)
    process with poles ``exp((-zeta*w +/- i*w*sqrt(1-zeta^2))/fs)`` — driven
    by independent unit white noise; the ``[n_modes, T]`` coordinates are
    mixed through the ``[n_modes, S]`` ``shapes`` matrix and independent
    sensor noise of ``sensor_noise * std`` is added.
    """
    shapes = np.atleast_2d(np.asarray(shapes, np.float64))
    rng = np.random.default_rng(seed)
    n = int(t_sec * fs)
    qs = []
    for f, z in zip(freqs_hz, zetas):
        w = 2.0 * np.pi * f
        r = np.exp(-z * w / fs)
        th = w * np.sqrt(1.0 - z * z) / fs
        a1, a2 = 2.0 * r * np.cos(th), -(r * r)
        e = rng.standard_normal(n)
        try:
            import scipy.signal

            q = scipy.signal.lfilter([1.0], [1.0, -a1, -a2], e)
        except ImportError:  # pragma: no cover - scipy is in the dev image
            q = np.empty(n)
            qm1 = qm2 = 0.0
            for t in range(n):
                q[t] = a1 * qm1 + a2 * qm2 + e[t]
                qm1, qm2 = q[t], qm1
        qs.append(q)
    x = shapes.T @ np.stack(qs)
    x += sensor_noise * np.std(x) * rng.standard_normal(x.shape)
    return x.astype(np.float32)
