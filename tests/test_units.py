"""Direct unit coverage for utility seams exercised only indirectly elsewhere."""

import statistics
from datetime import datetime

import numpy as np
import pytest

from apda_fft_tpu.ops.fft import is_pow2, next_pow2, split_pow2


def test_pow2_helpers():
    assert [is_pow2(n) for n in (1, 2, 3, 64, 65, 4096)] == [
        True, True, False, True, False, True,
    ]
    for n in (2, 4, 64, 1024, 4096, 65536):
        n1, n2 = split_pow2(n)
        assert n1 * n2 == n and n1 >= n2
        assert is_pow2(n1) and is_pow2(n2)
        assert n1 <= 2 * n2  # balanced split
    assert next_pow2(1000) == 1024 and next_pow2(1024) == 1024


def test_quantize_like_log_matches_format_roundtrip():
    from apda_fft_tpu.io.halffloat import format_samples, quantize_like_log

    rng = np.random.default_rng(0)
    vals = rng.uniform(-10, 10, 64).astype(np.float64)
    q = quantize_like_log(vals)
    parsed = np.asarray([float(tok.rstrip(";")) for tok in format_samples(vals)])
    np.testing.assert_array_equal(q, parsed)
    # idempotent: quantizing a quantized value changes nothing
    np.testing.assert_array_equal(quantize_like_log(q), q)


def test_timestamp_from_filename():
    from apda_fft_tpu.gateway.egress import timestamp_from_filename

    ts = timestamp_from_filename("0013a20041e7f6b7_Xaxis_17_08_2026_01_11_37.log")
    assert ts == datetime(2026, 8, 17, 1, 11, 37)
    assert timestamp_from_filename("garbage.log") is None


def test_telemetry_report_and_fault_flag():
    from apda_fft_tpu.gateway.telemetry import device_status_report, has_hardware_fault
    from apda_fft_tpu.io.packets import encode_sync_request, parse_sync_info

    clean = parse_sync_info(encode_sync_request(battery_v=3.7, rssi_db=55))
    assert not has_hardware_fault(clean)
    report = device_status_report(clean)
    assert "Battery: 3.700 V" in report and "RSSI: -55 dB" in report

    faulty = parse_sync_info(encode_sync_request(errors={"355": 1}))
    assert faulty.errors["355"] == 1
    assert has_hardware_fault(faulty)


def test_mean_std_ddof1_matches_statistics():
    from apda_fft_tpu.ops.stats import mean_std_ddof1

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 100, 257)
    m, s = mean_std_ddof1(jnp.asarray(x))
    assert float(m) == pytest.approx(statistics.mean(x.tolist()), rel=1e-12)
    assert float(s) == pytest.approx(statistics.stdev(x.tolist()), rel=1e-9)


def test_default_k_per_mode():
    from apda_fft_tpu.models.pipeline import default_k

    assert default_k("flexible") == 4   # reference top-4 (prominence)
    assert default_k("rigid") == 5      # reference top-5 (resolution)
    assert default_k("adaptive") >= 4


def test_prominence_select_ordering_and_overflow():
    import jax.numpy as jnp

    from apda_fft_tpu.ops.peaks_prominence import prominence_select

    # Three clear peaks above the mean+2*stdev threshold (~10.7 here),
    # magnitudes 30 > 20 > 12.
    m = np.ones(64) * 0.1
    m[10], m[20], m[30] = 20.0, 30.0, 12.0
    cid, is_cand, cmag, thr, std, n_cand = prominence_select(jnp.asarray(m), 4)
    assert int(n_cand) == 3
    got = [int(i) for i, v in zip(np.asarray(cid), np.asarray(is_cand)) if v]
    assert got == [20, 10, 30]  # magnitude-descending
    # Budget 2 truncates but reports the true pre-budget count.
    _, is2, _, _, _, n2 = prominence_select(jnp.asarray(m), 2)
    assert int(n2) == 3 and int(np.sum(np.asarray(is2))) == 2
