"""Anti-aliased decimation (ops/resample.py): scipy parity, alias
rejection, time alignment, mixed-rate FDD fusion, CLI --decimate."""

import numpy as np
import pytest

from apda_fft_tpu.ops.resample import (
    decimate,
    decimation_factor,
    design_decimation_taps,
)
from apda_fft_tpu.utils.synthetic import modal_records as _modal_records

scipy_signal = pytest.importorskip("scipy.signal")


def test_decimate_matches_scipy_resample_poly():
    rng = np.random.default_rng(0)
    for q, t in [(2, 4096), (4, 10000), (5, 12345), (3, 1001)]:
        x = rng.standard_normal((3, t))
        taps = design_decimation_taps(q)
        ref = scipy_signal.resample_poly(x, 1, q, axis=-1, window=taps)
        got = decimate(x, q)
        assert got.shape == ref.shape
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 3e-6, (q, t, err)


def test_decimate_rejects_aliases_keeps_passband():
    fs, q, t_n = 500.0, 4, 50000
    t = np.arange(t_n) / fs
    hi = np.sin(2 * np.pi * 0.45 * fs * t)  # above the new 62.5 Hz Nyquist
    lo = np.sin(2 * np.pi * 20.0 * t + 0.7)
    y = decimate(hi + lo, q)
    t2 = np.arange(len(y)) / (fs / q)
    # Away from the zero-padded edges the decimated signal IS the passband
    # tone: the 225 Hz component must not fold onto 25 Hz.
    resid = (y - np.sin(2 * np.pi * 20.0 * t2 + 0.7))[100:-100]
    assert np.abs(resid).max() < 5e-3, np.abs(resid).max()


def test_decimate_identity_and_validation():
    x = np.random.default_rng(1).standard_normal((2, 256))
    np.testing.assert_array_equal(decimate(x, 1), x)
    with pytest.raises(ValueError, match=">= 1"):
        decimate(x, 0)
    with pytest.raises(ValueError, match="too short"):
        decimate(x[:, :4], 8)
    with pytest.raises(ValueError, match="ntaps_per_phase"):
        design_decimation_taps(2, ntaps_per_phase=1)
    with pytest.raises(ValueError, match="cutoff_rel"):
        design_decimation_taps(2, cutoff_rel=1.5)


def test_decimation_factor():
    assert decimation_factor(250.0, 62.5) == 4
    assert decimation_factor(125.0, 125.0) == 1
    assert decimation_factor(100.0, 30.0) is None  # non-integer ratio
    assert decimation_factor(62.5, 125.0) is None  # upsampling
    assert decimation_factor(125.0, 0.0) is None


def test_mixed_rate_fdd_fusion_recovers_shape():
    """A 2x-rate sensor decimated onto the base rate joins the CSD with the
    correct mode-shape component - the mixed-ODR array capability."""
    from apda_fft_tpu.models.modal import fdd

    fs = 125.0
    shapes = np.array([[0.5, 1.0, -0.8]])
    x = _modal_records(shapes, [9.3], [0.015], fs * 2, 240.0, seed=3)
    # Sensor 0 stays fast (250 Hz); sensors 1-2 are born at 125 Hz by
    # ideal 2x subsampling of the same continuous truth (band-limited
    # well below 62.5 Hz, so plain subsampling is exact here).
    fast = x[0]
    slow = x[1:, ::2]
    fused = np.vstack([decimate(fast, 2)[: slow.shape[1]],
                       slow[:, : slow.shape[1]]]).astype(np.float32)
    res = fdd(fused, fs, window=1024)
    n = int(res.count)
    assert n >= 1
    i = int(np.argmin(np.abs(res.freq[:n] - 9.3)))
    assert abs(res.freq[i] - 9.3) < 0.2
    shape = np.abs(res.shapes()[i])
    shape /= shape.max()
    want = np.abs(shapes[0]) / np.abs(shapes[0]).max()
    np.testing.assert_allclose(shape, want, atol=0.08)


def _write_mixed_rate_files(tmp_path, recs, rates):
    from tests.test_ssi import _write_acq_files

    paths = []
    for j, (rec, fs) in enumerate(zip(recs, rates)):
        sub = tmp_path / f"s{j}"
        sub.mkdir()
        paths.extend(_write_acq_files(sub, rec[None, :], fs))
    return paths


def test_cli_fdd_decimate_mixed_rates(tmp_path, capsys):
    import json

    from apda_fft_tpu.__main__ import main

    fs = 125.0
    shapes = np.array([[0.6, 1.0]])
    x = _modal_records(shapes, [9.3], [0.015], fs * 2, 180.0, seed=4)
    paths = _write_mixed_rate_files(
        tmp_path, [x[0], x[1, ::2]], [fs * 2, fs]
    )
    # Without --decimate mixed rates stay an error (unchanged contract).
    assert main(["fdd", *paths, "--window", "1024"]) == 1
    assert "differ" in capsys.readouterr().err
    assert main(["fdd", *paths, "--window", "1024", "--decimate",
                 "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["fs"] == fs
    assert any(abs(m["freq"] - 9.3) < 0.2 for m in out["modes"])

    # Non-integer ratios still refuse, with a clear message.
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    bad = _write_mixed_rate_files(
        bad_dir, [x[0][:3000], x[1][:3000]], [100.0, 30.0]
    )
    assert main(["fdd", *bad, "--window", "256", "--decimate"]) == 1
    assert "integer" in capsys.readouterr().err


def test_gateway_modal_decimate_fuses_mixed_odr_array(tmp_path):
    """Two 125 Hz sensors + one 250 Hz sensor: with modal_decimate the
    sync-boundary FDD report covers all three on the 125 Hz time base."""
    from apda_fft_tpu.gateway.transport import SensorSimulator
    from tests.test_gateway import make_service

    fs = 125.0
    shapes = np.array([[0.5, 1.0, -0.8]])
    # One continuous truth at 250 Hz; sensors 0-1 sample it at 125 Hz
    # (every 2nd sample), sensor 2 natively at 250 Hz.
    x = _modal_records(shapes, [9.3], [0.015], fs * 2, 60.0, seed=11)
    svc, transport, _, _ = make_service(
        tmp_path,
        gateway_extra={"fdd_report": True, "fdd_window": 1024,
                       "fdd_min_sensors": 3, "modal_decimate": True},
    )
    macs = [f"0013a20041e7fa0{i}" for i in range(3)]
    for mac, rec, rate in ((macs[0], x[0, ::2], fs), (macs[1], x[1, ::2], fs),
                           (macs[2], x[2], fs * 2)):
        SensorSimulator(mac, fs=rate, axis="X",
                        chunk=100).stream_acquisition(transport, rec)
    SensorSimulator(macs[0]).heartbeat(transport)
    svc.drain()
    history = open(svc.config.logger_file).read()
    assert f"decimated X record from {macs[2]} 250 -> 125 Hz" in history
    assert "[FDD] X: 3 sensors" in history, history
    mode_lines = [ln for ln in history.splitlines() if "[FDD]   f=9." in ln]
    assert mode_lines, history
    # Shape has three components (all sensors fused).
    assert mode_lines[0].count("j") == 3, mode_lines[0]
    assert "Error in main loop" not in history


def test_gateway_modal_decimate_noninteger_ratio_stays_split(tmp_path):
    """A non-integer rate ratio must not be force-fused; groups stay
    separate and each reports (or stays pending) on its own."""
    from tests.test_gateway import make_service

    svc, _, _, _ = make_service(
        tmp_path,
        gateway_extra={"fdd_report": True, "fdd_window": 256,
                       "fdd_min_sensors": 2, "modal_decimate": True},
    )
    rng = np.random.default_rng(0)
    from datetime import datetime

    ts = datetime(2026, 8, 18, 10, 0, 0)
    svc._fdd_pending[("X", 125.0)] = {
        "aaaa": (rng.standard_normal(2048).astype(np.float32), ts),
        "bbbb": (rng.standard_normal(2048).astype(np.float32), ts),
    }
    svc._fdd_pending[("X", 31.25)] = {
        "cccc": (rng.standard_normal(2048).astype(np.float32), ts),
    }
    svc._decimate_merge_pending()
    # 125/31.25 = 4 -> the faster group merges ONTO the slowest rate.
    assert ("X", 125.0) not in svc._fdd_pending
    assert set(svc._fdd_pending[("X", 31.25)]) == {"aaaa", "bbbb", "cccc"}
    # Now a truly non-integer pair.
    svc._fdd_pending[("Y", 100.0)] = {
        "aaaa": (rng.standard_normal(2048).astype(np.float32), ts),
    }
    svc._fdd_pending[("Y", 62.5)] = {
        "bbbb": (rng.standard_normal(2048).astype(np.float32), ts),
    }
    svc._decimate_merge_pending()
    assert ("Y", 100.0) in svc._fdd_pending and ("Y", 62.5) in svc._fdd_pending


def test_resample_rational_matches_scipy():
    from apda_fft_tpu.ops.resample import _rational_taps, resample_rational

    rng = np.random.default_rng(2)
    for up, down, t in [(5, 8, 10000), (2, 3, 4096), (3, 2, 5000),
                        (4, 1, 2048)]:
        x = rng.standard_normal((2, t))
        taps = _rational_taps(up, down, 12, 0.8)
        ref = scipy_signal.resample_poly(x, up, down, axis=-1, window=taps / up)
        got = resample_rational(x, up, down)
        assert got.shape == ref.shape
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 3e-6, (up, down, err)
    # Common-factor reduction and identity.
    x = rng.standard_normal(3000)
    np.testing.assert_allclose(resample_rational(x, 4, 8),
                               resample_rational(x, 1, 2), atol=0)
    np.testing.assert_array_equal(resample_rational(x, 3, 3), x)
    with pytest.raises(ValueError, match=">= 1"):
        resample_rational(x, 0, 2)
    with pytest.raises(ValueError, match="too short"):
        resample_rational(x[:4], 1, 8)


def test_rational_factors():
    from apda_fft_tpu.ops.resample import rational_factors

    assert rational_factors(100.0, 62.5) == (5, 8)
    assert rational_factors(62.5, 100.0) == (8, 5)
    assert rational_factors(250.0, 125.0) == (1, 2)
    assert rational_factors(100.0, 100.0) == (1, 1)
    assert rational_factors(100.0, 0.0) is None
    assert rational_factors(np.pi * 100, 100.0) is None  # irrational


def test_cli_fdd_resample_rational_rates(tmp_path, capsys):
    import json

    from apda_fft_tpu.__main__ import main

    # 100 Hz guest sensor against a 75 Hz base: --decimate refuses
    # (non-integer), --resample fuses via (3, 4).  Truth generated at
    # 300 Hz so both rates subsample it exactly.
    fs_slow, fs_fast = 75.0, 100.0
    t_sec = 200.0
    x = _modal_records(np.array([[0.6, 1.0]]), [9.3], [0.015], 300.0,
                       t_sec, seed=8)
    paths = _write_mixed_rate_files(
        tmp_path, [x[0, ::4], x[1, ::3]], [fs_slow, fs_fast]
    )
    assert main(["fdd", *paths, "--window", "512", "--decimate"]) == 1
    assert "--resample" in capsys.readouterr().err
    assert main(["fdd", *paths, "--window", "512", "--resample",
                 "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["fs"] == fs_slow
    assert any(abs(m["freq"] - 9.3) < 0.3 for m in out["modes"]), out["modes"]


def test_gateway_config_new_keys(tmp_path):
    import json

    from apda_fft_tpu.gateway.config import GatewayConfig

    cfg = {
        "gateway": {
            "logger_file": str(tmp_path / "history.log"),
            "device_file": str(tmp_path / "devices.txt"),
            "config_file": str(tmp_path / "config.txt"),
            "harmonic_check": True,
            "modal_decimate": True,
        }
    }
    p = tmp_path / "gw_config.json"
    p.write_text(json.dumps(cfg))
    c = GatewayConfig.load(p)
    assert c.harmonic_check is True and c.modal_decimate is True
    # Defaults are off = reference parity.
    cfg["gateway"].pop("harmonic_check")
    cfg["gateway"].pop("modal_decimate")
    p.write_text(json.dumps(cfg))
    c = GatewayConfig.load(p)
    assert c.harmonic_check is False and c.modal_decimate is False
