"""CLI commands and the hardware-transport adapter (mocked vendor stack)."""

import json
import sys
import types

import pytest

from apda_fft_tpu.io import logfile
from tests.signals import two_mode_signal


@pytest.fixture
def log_file(tmp_path):
    x = two_mode_signal(1024, 500.0)
    path = tmp_path / "0013a20041e7f6b7_Xaxis_16_08_2026_10_20_30.log"
    logfile.write_acquisition_header(
        path, "10:20:30", "2g", "500 Hz", "X axis", "Synced",
        means=["22.0", "0.01", "0.01", "0.98"], humidity=50.0,
        baselines=(0.0, 0.0, 0.0),
    )
    logfile.append_samples(path, [f"{v:8.6f}" for v in x])
    return str(path)


def test_cli_analyze_json(log_file, capsys):
    from apda_fft_tpu.__main__ import main

    rc = main(["analyze", log_file, "--json", "--refine"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fs"] == 500.0 and out["n_fft"] == 1024
    freqs = [p["freq"] for p in out["peaks"]]
    assert any(abs(f - 12.207) < 0.3 for f in freqs)
    assert all("refined_freq" in p for p in out["peaks"])


def test_cli_analyze_text_and_modes(log_file, capsys):
    from apda_fft_tpu.__main__ import main

    assert main(["analyze", log_file, "--mode", "rigid"]) == 0
    text = capsys.readouterr().out
    assert "f=" in text and "mag=" in text
    assert main(["analyze", log_file, "--taper", "hann"]) == 0
    assert "f=" in capsys.readouterr().out


def test_cli_track_reports_drift(tmp_path, capsys):
    import numpy as np

    from apda_fft_tpu.__main__ import main

    fs, n = 500.0, 1024
    t = np.arange(n) / fs
    paths = []
    for e in range(6):
        f1 = 25.0 * (1 - 0.01 * e)  # 1%/acquisition drift
        x = np.sin(2 * np.pi * f1 * t) + 0.6 * np.sin(2 * np.pi * 47.7 * t)
        p = tmp_path / f"0013a20041e7f6b7_Xaxis_1{e}_08_2026_10_20_30.log"
        logfile.write_acquisition_header(
            p, "10:20:30", "2g", "500 Hz", "X axis", "Synced",
            means=["22.0", "0.01", "0.01", "0.98"], humidity=50.0,
            baselines=(0.0, 0.0, 0.0),
        )
        logfile.append_samples(p, [f"{v:8.6f}" for v in x])
        paths.append(str(p))
    rc = main(["track", *paths, "--rel-drift", "0.02"])
    out = capsys.readouterr().out
    assert rc == 2  # alert fired
    assert "ALERT" in out and "drifted" in out
    assert "0013a20041e7f6b7/X" in out


def test_cli_oracle_check(log_file, capsys):
    from apda_fft_tpu.__main__ import main

    rc = main(["oracle-check", log_file])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("MATCH") == 2 and "MISMATCH" not in out


def test_cli_skips_corrupt(tmp_path, capsys):
    from apda_fft_tpu.__main__ import main

    bad = tmp_path / "bad.log"
    bad.write_text("x\n")
    assert main(["analyze", str(bad)]) == 1


class _FakeRemote:
    def get_64bit_addr(self):
        return "0013A20041E7F6B7"


class _FakeMessage:
    def __init__(self, data):
        self.data = data
        self.remote_device = _FakeRemote()


class _FakeDevice:
    def __init__(self):
        self.inbox = [_FakeMessage(b"\xa1\x01\x02")]
        self.sent = []
        self._open = False

    def open(self):
        self._open = True

    def is_open(self):
        return self._open

    def close(self):
        self._open = False

    def read_data(self, timeout=None):
        return self.inbox.pop(0) if self.inbox else None

    def send_data(self, remote, payload):
        self.sent.append((remote, payload))


def test_xbee_transport_with_mocked_vendor_stack(monkeypatch):
    """Drive XBeeTransport against a fake digidevice module (reference C6)."""
    fake_dev = _FakeDevice()
    fake_xbee = types.SimpleNamespace(get_device=lambda: fake_dev)
    monkeypatch.setitem(sys.modules, "digidevice", types.SimpleNamespace(xbee=fake_xbee))

    from apda_fft_tpu.gateway.transport import XBeeTransport

    logs = []
    t = XBeeTransport(timeout=1)
    t.start(logs.append)
    assert fake_dev.is_open()

    payload, addr = t.receive(logs.append)
    assert payload == b"\xa1\x01\x02"
    assert addr == "0013a20041e7f6b7"  # lowercased 64-bit MAC

    # known device -> send works; unknown -> warning, False
    assert t.send(addr, "a1ff", logs.append) is True
    assert fake_dev.sent[0][1] == bytes.fromhex("a1ff")
    assert t.send("feedfacefeedface", "a1", logs.append) is False
    assert any("unknown device" in s for s in logs)

    # timeout path returns (None, None)
    assert t.receive(logs.append) == (None, None)
    t.stop(logs.append)
    assert not fake_dev.is_open()


def test_gateway_simulate_smoke(tmp_path, capsys):
    """The --simulate demo drives the full stack headlessly."""
    from apda_fft_tpu.gateway.__main__ import _simulate

    _simulate(2, str(tmp_path))
    out = capsys.readouterr().out
    assert "processed" in out and "2 sensors" in out
    assert "Peaks: X f1:" in out and "Peaks: Y f1:" in out
    assert "[FTP:sim] would upload" in out


def test_doctor_all_green(capsys):
    """doctor --json: every check passes on a healthy install (CPU here)."""
    from apda_fft_tpu.__main__ import main

    assert main(["doctor", "--json"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["ok"] is True
    names = {c["name"] for c in rep["checks"]}
    assert {"device", "native_codec", "fft_accuracy",
            "detector_flexible", "detector_rigid"} <= names
    assert all(c["ok"] for c in rep["checks"])


def test_doctor_respects_no_native(capsys, monkeypatch):
    monkeypatch.setenv("APDA_NO_NATIVE", "1")
    from apda_fft_tpu.__main__ import main

    assert main(["doctor", "--json"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    native = next(c for c in rep["checks"] if c["name"] == "native_codec")
    assert "APDA_NO_NATIVE" in native["detail"]


def test_top_level_gateway_passthrough(monkeypatch):
    """`python -m apda_fft_tpu gateway ...` forwards verbatim to the daemon
    CLI (the reference's primary entry, ``python GT_FFT_v5.py``)."""
    import apda_fft_tpu.__main__ as top
    import apda_fft_tpu.gateway.__main__ as gw

    calls = []
    monkeypatch.setattr(gw, "main", lambda argv=None: calls.append(argv))
    assert top.main(["gateway", "--simulate", "--sensors", "3"]) == 0
    assert calls == [["--simulate", "--sensors", "3"]]
    # and the subcommand is listed in --help (discoverability stub)
    with pytest.raises(SystemExit):
        top.main(["--help"])


def test_cli_severity(log_file, tmp_path, capsys):
    from apda_fft_tpu.__main__ import main

    rc = main(["severity", log_file, "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["velocity_rms_mms"] > 0
    assert out["band_hz"] == [10.0, 250.0]  # fhi clamped to Nyquist

    # Limit flagging: the two-mode signal is far above 0.001 mm/s.
    rc = main(["severity", log_file, "--limit", "0.001"])
    assert rc == 0
    assert "** OVER LIMIT **" in capsys.readouterr().out

    # Band entirely above Nyquist -> skipped, rc 1.
    rc = main(["severity", log_file, "--flo", "400"])
    assert rc == 1


def test_cli_integrate(log_file, tmp_path, capsys):
    import numpy as np

    from apda_fft_tpu.__main__ import main

    out_npz = str(tmp_path / "vel.npz")
    rc = main(["integrate", log_file, "--json", "--mms", "--out", out_npz])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quantity"] == "velocity" and out["unit"] == "mm/s"
    assert out["mid_peak"] > 0
    data = np.load(out_npz)
    key = [k for k in data.files if k.endswith("velocity")][0]
    assert data[key].shape == (1024,)

    rc = main(["integrate", log_file, "--quantity", "displacement"])
    assert rc == 0
    assert "displacement mid-peak" in capsys.readouterr().out


def test_cli_srs_rejects_bad_per_octave(log_file, capsys):
    from apda_fft_tpu.__main__ import main

    assert main(["srs", log_file, "--per-octave", "0"]) == 1
    assert "per-octave" in capsys.readouterr().err
