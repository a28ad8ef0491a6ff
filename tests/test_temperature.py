"""Temperature-compensated drift tracking (models/tracking.py + gateway).

Modal frequencies move with temperature more than early damage moves them
(the classic environmental confounder).  These tests pin the baseline
thermal model, the compensated drift metric, the alert fallback contract,
serialization, and the gateway end-to-end behavior in the two field
scenarios that matter: a cold snap must not fake stiffness loss, and a
warm spell must not mask it.
"""

import numpy as np
import pytest

from apda_fft_tpu.models.tracking import PeakTracker, Track

F0 = 10.0
SLOPE = 0.01  # Hz per deg C


def _track_with(temps, extra_drift_hz=None):
    """A track whose frequency follows F0 + SLOPE*(T-20) (+ optional damage)."""
    tr = Track(0)
    extra = extra_drift_hz or [0.0] * len(temps)
    for i, (temp, d) in enumerate(zip(temps, extra)):
        tr.times.append(float(i))
        tr.freqs.append(F0 + SLOPE * (temp - 20.0) + d)
        tr.mags.append(1.0)
        tr.temps.append(float(temp))
        tr.observed += 1
    return tr


def test_temperature_model_fit_and_guards():
    baseline = [20, 26, 14, 22, 18, 28, 12, 24, 20, 16]
    tr = _track_with(baseline)
    model = tr.temperature_model()
    assert model is not None
    intercept, slope = model
    assert slope == pytest.approx(SLOPE, rel=1e-6)
    # Too few observations -> None.
    assert _track_with(baseline[:5]).temperature_model() is None
    # Unidentifiable span -> None.
    assert _track_with([20.0] * 10).temperature_model() is None
    # Unknown temperatures -> None.
    tr2 = _track_with(baseline)
    tr2.temps = [float("nan")] * len(tr2.temps)
    assert tr2.temperature_model() is None
    # Model is fitted on the BASELINE half only: a late damage drift does
    # not contaminate the slope.
    damaged = _track_with(
        baseline + [20, 21, 19, 22, 18, 20, 21, 19, 20, 20],
        extra_drift_hz=[0.0] * 10 + [-0.5] * 10,
    )
    _, slope_d = damaged.temperature_model()
    assert slope_d == pytest.approx(SLOPE, rel=1e-6)


def test_cold_snap_does_not_fake_damage():
    """freq follows temperature exactly: raw drift alerts, compensated not."""
    temps = [20, 26, 14, 22, 18, 28, 12, 24, 20, 16] + [8, 8, 8]
    tr = _track_with(temps)
    raw = tr.sustained_drift_relative()
    comp = tr.compensated_drift_relative()
    assert raw < -0.008  # the thermal swing reads as -1.2% "drift"
    assert abs(comp) < 1e-6

    tk = PeakTracker()
    tk._tracks = [tr]
    assert tk.alerts(rel_drift=0.008) == [tr]
    assert tk.alerts(rel_drift=0.008, compensate_temperature=True) == []


def test_warm_spell_does_not_mask_damage():
    """True -1.5% stiffness drift during a warm spell: raw metric is washed
    out to ~-0.3%, the compensated residual still shows the damage."""
    temps = [20, 26, 14, 22, 18, 28, 12, 24, 20, 16] + [32, 32, 32]
    damage = [0.0] * 10 + [-0.015 * F0] * 3
    tr = _track_with(temps, extra_drift_hz=damage)
    raw = tr.sustained_drift_relative()
    comp = tr.compensated_drift_relative()
    assert abs(raw) < 0.008, raw  # masked below a sane threshold
    assert comp < -0.012, comp

    tk = PeakTracker()
    tk._tracks = [tr]
    assert tk.alerts(rel_drift=0.008) == []
    assert tk.alerts(rel_drift=0.008, compensate_temperature=True) == [tr]


def test_alerts_fall_back_to_raw_without_model():
    """No temperature data: compensate_temperature must behave exactly like
    the raw metric (never suppress an alert it cannot improve on)."""
    tr = Track(0)
    for i, f in enumerate([10.0] * 5 + [9.8] * 5):
        tr.times.append(i)
        tr.freqs.append(f)
        tr.mags.append(1.0)
        tr.temps.append(float("nan"))
        tr.observed += 1
    tk = PeakTracker()
    tk._tracks = [tr]
    assert tk.alerts(rel_drift=0.01) == [tr]
    assert tk.alerts(rel_drift=0.01, compensate_temperature=True) == [tr]


def test_update_freqs_threads_temp_and_serializes():
    tk = PeakTracker()
    for i in range(6):
        tk.update_freqs([10.0 + 0.001 * i], [1.0], temp=15.0 + i)
    tk.update_freqs([10.006], [1.0])  # unknown temp -> NaN slot
    (tr,) = tk._tracks
    assert tr.temps[:6] == [15.0, 16.0, 17.0, 18.0, 19.0, 20.0]
    assert np.isnan(tr.temps[6]) and len(tr.temps) == len(tr.freqs)

    d = tk.to_dict()
    import json

    json.dumps(d)
    tk2 = PeakTracker.from_dict(d)
    (tr2,) = tk2._tracks
    assert tr2.temps[:6] == tr.temps[:6] and np.isnan(tr2.temps[6])

    # Legacy state without temps loads as all-NaN of the right length.
    for s in d["tracks"]:
        s.pop("temps", None)
    tk3 = PeakTracker.from_dict(d)
    (tr3,) = tk3._tracks
    assert len(tr3.temps) == len(tr3.freqs) and np.isnan(tr3.temps).all()

    # All-NaN temps are omitted from the serialized form (state files from
    # temperature-less deployments stay byte-stable).
    assert "temps" not in tk3.to_dict()["tracks"][0]


def test_history_cap_keeps_temps_aligned():
    tk = PeakTracker(history_cap=16)
    for i in range(40):
        tk.update_freqs([10.0], [1.0], temp=float(i))
    (tr,) = tk._tracks
    assert len(tr.temps) == len(tr.freqs) == len(tr.times) == 16
    # Head is preserved (the drift baseline), tail is the recent epochs.
    assert tr.temps[0] == 0.0 and tr.temps[-1] == 39.0


def _stream_tone(svc, transport, mac, freq, fs, temperature, n=4096, seed=0):
    from apda_fft_tpu.gateway.transport import SensorSimulator

    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * freq * t) + 0.005 * np.random.default_rng(
        seed
    ).standard_normal(n)
    sim = SensorSimulator(mac, fs=fs, axis="X", chunk=120,
                          temperature=temperature)
    sim.stream_acquisition(transport, x.astype(np.float64))
    svc.drain()


@pytest.mark.slow
def test_gateway_temp_compensation_end_to_end(tmp_path):
    """Cold snap with drift_temp_compensate: no alert.  Same traffic without
    compensation: false alert.  The real pipeline (binary16 wire encode,
    refined frequencies, file round trip) carries the temperature from the
    0xD1 means slot into the tracker."""
    import sys

    sys.path.insert(0, "tests")
    from tests.test_gateway import make_service

    fs = 125.0
    mac = "0013a20041e7fb01"
    # Day/night swings ordered so consecutive thermal frequency jumps stay
    # inside the tracker's 2% match window (real weather is continuous).
    baseline_temps = [20, 26, 22, 28, 24, 16, 12, 18, 14, 16]
    snap_temps = [2, 2, 2]

    def run(subdir, compensate):
        d = tmp_path / subdir
        d.mkdir()
        svc, transport, _, _ = make_service(
            d,
            gateway_extra={"drift_alert_rel": 0.008,
                           "drift_temp_compensate": compensate},
        )
        for i, temp in enumerate(baseline_temps + snap_temps):
            freq = F0 * (1.0 + 0.0008 * (temp - 20.0))
            _stream_tone(svc, transport, mac, freq, fs, float(temp), seed=i)
        return open(svc.config.logger_file).read()

    hist_comp = run("comp", True)
    assert "[ALERT]" not in hist_comp, hist_comp
    hist_raw = run("raw", False)
    assert "[ALERT]" in hist_raw and "drifted" in hist_raw


def test_cli_track_temp_compensate(tmp_path, capsys):
    """The track CLI reads temperatures from the files; --temp-compensate
    suppresses the cold-snap false alarm the raw run raises (exit 2)."""
    from apda_fft_tpu.__main__ import main
    from apda_fft_tpu.io import logfile

    fs = 125.0
    rng = np.random.default_rng(0)
    temps = [20, 26, 22, 28, 24, 16, 12, 18, 14, 16, 2, 2, 2]
    paths = []
    for i, temp in enumerate(temps):
        freq = F0 * (1.0 + 0.0008 * (temp - 20.0))
        t = np.arange(4096) / fs
        x = np.sin(2 * np.pi * freq * t) + 0.005 * rng.standard_normal(4096)
        p = tmp_path / f"0013a20041e7fc01_Xaxis_16_08_2026_10_{i:02d}_00.log"
        logfile.write_acquisition_header(
            p, "10:00:00", "2g", "125 Hz", "X axis", "Synced",
            means=[f"{temp:8.6f}", "0.01", "0.01", "0.98"], humidity=50.0,
            baselines=(0.0, 0.0, 0.0),
        )
        logfile.append_samples(p, [f"{v:8.6f}" for v in x])
        paths.append(str(p))

    assert main(["track", *paths, "--rel-drift", "0.008"]) == 2
    out_raw = capsys.readouterr().out
    assert "ALERT" in out_raw
    assert main(["track", *paths, "--rel-drift", "0.008",
                 "--temp-compensate"]) == 0
    out_comp = capsys.readouterr().out
    assert "ALERT" not in out_comp
