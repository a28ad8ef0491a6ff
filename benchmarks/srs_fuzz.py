"""SRS device-vs-oracle fuzz: f32 rotation-coordinate scan vs float64 lfilter.

Random transients (half-sine pulses, damped ring-downs, noise bursts, and
mixes) through ``ops/srs.py`` on the attached device, gated against the
sequential float64 ``scipy.signal.lfilter`` oracle with identical
ISO 18431-4 coefficients.  Exit 0 iff every case's bank-wide max relative
error is under the gate (tests/test_srs.py measured 3.6e-6 on CPU).
"""

from __future__ import annotations

import json
import sys

import numpy as np


def run_srs_fuzz(cases: int = 20, gate: float = 5e-5) -> dict:
    import scipy.signal as sig

    from apda_fft_tpu.ops.srs import (
        shock_response_spectrum,
        smallwood_coefficients,
    )

    rng = np.random.default_rng(42)
    worst = 0.0
    passed = 0
    for case in range(cases):
        fs = float(rng.choice([100.0, 250.0, 500.0, 1000.0]))
        n = int(rng.choice([256, 512, 1024]))
        t = np.arange(n) / fs
        kind = case % 3
        if kind == 0:  # half-sine pulse
            tau = float(rng.uniform(4, 20)) / fs
            x = np.where(t < tau, rng.uniform(5, 80) * np.sin(np.pi * t / tau), 0.0)
        elif kind == 1:  # damped ring-down
            f0 = float(rng.uniform(fs / 20, fs / 5))
            zeta = float(rng.uniform(0.005, 0.08))
            x = rng.uniform(1, 10) * np.exp(-zeta * 2 * np.pi * f0 * t) * np.sin(
                2 * np.pi * f0 * t)
        else:  # noise burst
            burst = int(rng.integers(8, n // 4))
            x = np.zeros(n)
            x[:burst] = rng.uniform(2, 30) * rng.standard_normal(burst)
        x = x.astype(np.float32)

        res = shock_response_spectrum(x, fs)
        b, a = smallwood_coefficients(res.freqs, fs)
        xp = np.concatenate(
            [np.asarray(x, np.float64),
             np.zeros(int(np.ceil(fs / res.freqs.min())))])
        ref = np.array(
            [np.max(np.abs(sig.lfilter(b[:, i], a[:, i], xp)))
             for i in range(len(res.freqs))])
        rel = float(np.max(np.abs(res.maximax - ref) / ref))
        worst = max(worst, rel)
        passed += rel < gate
    return {
        "metric": "srs_fuzz",
        "cases": cases,
        "passed": passed,
        "worst_rel_err": worst,
        "gate": gate,
        "ok": passed == cases,
    }


def main() -> None:
    result = run_srs_fuzz()
    print(json.dumps(result))
    raise SystemExit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
