"""Memory-fed analysis parity: decisions bit-identical to the file-fed path.

``analysis_feed="memory"`` (the default) hands ``_analyze_files`` the
in-memory record accumulated while packets streamed in, quantized through
the same ``"%8.6f"`` contract the on-disk format imposes;
``analysis_feed="file"`` restores the reference's write-then-re-parse
round-trip (``GT_FFT_v5.py:627`` -> ``utils/load_data.py:29-82``).  Across
the fault corpus - clean / dropped-packet / truncated / shock / reduced -
every analysis decision (peaks, severity, drift-tracker state, FDD/SSI
report lines) must be bit-identical between the two feeds, with the native
fast path AND the pure-Python fallback (``APDA_NO_NATIVE=1``).
"""

import copy
import json
import os
from datetime import datetime, timezone

import numpy as np

from apda_fft_tpu.gateway.transport import SensorSimulator
from apda_fft_tpu.io import native
from apda_fft_tpu.io.logfile import (
    SensorLogBuilder,
    acquisition_header_lines,
    load_sensor_log,
)
from tests.test_gateway import make_service

WIRE_T0 = datetime(2026, 8, 16, 9, 0, 0, tzinfo=timezone.utc)

CORPUS_EXTRA = {
    "analyze_shock": True,
    "shock_srs": True,
    "drift_alert_rel": 0.02,
    "drift_temp_compensate": True,
    "vibration_severity": True,
    "severity_band_hz": [5.0, 100.0],
    "severity_alert_mms": 15.0,
    "fdd_report": True,
    "fdd_window": 256,
    "fdd_min_sensors": 2,
    "ssi_report": True,
    "ssi_block_rows": 12,
}


def _run_corpus(tmp_path, feed: str, epochs: int = 3):
    """Drive one gateway over the deterministic fault corpus; return its
    decision surface (pre-sync fft_results snapshots, history text with the
    data_dir normalized out, persisted drift state)."""
    sub = tmp_path / feed
    sub.mkdir()
    svc, transport, _, _ = make_service(
        sub, flush_mode="on_sync",
        gateway_extra={"analysis_feed": feed, **CORPUS_EXTRA},
    )
    macs = [f"0013a20041e7{i:04x}" for i in range(4)]
    rng = np.random.default_rng(7)
    fs = 250.0
    decisions = []
    for epoch in range(epochs):
        for i, mac in enumerate(macs):
            sim = SensorSimulator(mac, fs=fs, axis="X", chunk=100,
                                  seed=1000 * epoch + i,
                                  temperature=20.0 + i + 0.5 * epoch)
            n = 1000
            t = np.arange(n) / fs
            x = (np.sin(2 * np.pi * 12.3 * t)
                 + 0.5 * np.sin(2 * np.pi * 31.4 * t)
                 + 0.3 * rng.standard_normal(n))
            k = (epoch * len(macs) + i) % 5
            if k in (0, 3):
                sim.stream_acquisition(transport, x, now=WIRE_T0)
            elif k == 1:
                sim.stream_acquisition(transport, x, drop_packets={3},
                                       now=WIRE_T0)
            elif k == 2:
                sim.stream_acquisition(transport, x, truncate_after=4,
                                       now=WIRE_T0)
            else:
                td = np.arange(256) / fs
                sim.shock_event(
                    transport, np.exp(-2.0 * td) * np.sin(2 * np.pi * 20 * td))
            if k == 4:
                sim.reduced_data(transport, x[:400])
        svc.drain()
        # One heartbeat closes the epoch batch (on_sync flush); snapshot
        # the per-sensor decision dicts before each sensor's sync pops its
        # own entry.
        SensorSimulator(macs[0]).heartbeat(transport)
        svc.drain()
        decisions.append(copy.deepcopy(svc.fft_results))
        for mac in macs[1:]:
            SensorSimulator(mac).heartbeat(transport)
        svc.drain()
    history = open(svc.config.logger_file).read().replace(
        str(svc.config.data_dir), "DATA_DIR/")
    with open(os.path.join(svc.config.data_dir, "drift_tracks.json")) as fh:
        drift_state = json.load(fh)
    svc.stop()
    return decisions, history, drift_state


#: runtime SELF-METRICS, not decisions: wall/CPU time and RSS differ between
#: any two runs by construction (reference parity fields, GT_FFT_v5.py:663-676)
_METRIC_KEYS = {"process_time", "wall_time", "percentage_cpu", "memrss"}


def _strip_metrics(decisions):
    return [
        {mac: {ax: {k: v for k, v in entry.items() if k not in _METRIC_KEYS}
               for ax, entry in by_axis.items()}
         for mac, by_axis in epoch.items()}
        for epoch in decisions
    ]


def _strip_metric_lines(history: str) -> str:
    # "Datetime:" echoes the heartbeat's real wall-clock; "Process time:"
    # is the self-metrics line - both vary run to run, decisions don't.
    return "\n".join(
        ln for ln in history.splitlines()
        if not ln.lstrip().startswith(("Datetime:", "Process time:"))
    )


def _assert_same_decisions(a, b):
    dec_a, hist_a, drift_a = a
    dec_b, hist_b, drift_b = b
    # peak freqs/mags, severity, SRS - exact float equality
    assert _strip_metrics(dec_a) == _strip_metrics(dec_b)
    assert drift_a == drift_b  # tracker histories incl. sub-bin freqs
    # every report/alert/[FDD]/[SSI]/marker line
    assert _strip_metric_lines(hist_a) == _strip_metric_lines(hist_b)


def test_memory_vs_file_feed_decision_parity(tmp_path):
    """Full-corpus decision parity, native ingest path."""
    mem = _run_corpus(tmp_path, "memory")
    fil = _run_corpus(tmp_path, "file")
    _assert_same_decisions(mem, fil)
    # The corpus actually exercised analysis + faults (not a vacuous pass).
    hist = mem[1]
    assert "Peaks: X f1:" in hist
    assert "Missing packets" in hist
    assert "Anomalous closure" in hist
    assert "Shock SRS:" in hist
    assert "Vibration severity" in hist
    assert "[FDD]" in hist and "[SSI]" in hist


def test_memory_vs_file_feed_parity_python_fallback(tmp_path, monkeypatch):
    """Same corpus through the pure-Python quantize/append fallback."""
    monkeypatch.setenv("APDA_NO_NATIVE", "1")
    assert not native.available()
    mem = _run_corpus(tmp_path, "memory", epochs=2)
    fil = _run_corpus(tmp_path, "file", epochs=2)
    _assert_same_decisions(mem, fil)


def _drive_eviction(tmp_path, feed: str, n_sensors: int = 280):
    """n_sensors in-flight acquisitions (start packet only) - past the
    256 stranded-builder/fd cap - then complete the FIRST (evicted from
    both the builder and fd rosters) and the LAST (still resident)."""
    from apda_fft_tpu.io import packets as pk

    sub = tmp_path / f"evict_{feed}"
    sub.mkdir()
    svc, transport, _, _ = make_service(
        sub, flush_mode="on_sync", gateway_extra={"analysis_feed": feed})
    fs = 250.0
    macs = [f"0013a20041e8{i:04x}" for i in range(n_sensors)]
    t = np.arange(200) / fs
    x = np.sin(2 * np.pi * 30.0 * t) + 0.2 * np.sin(2 * np.pi * 71.0 * t)
    for mac in macs:
        sim = SensorSimulator(mac, fs=fs, axis="X", chunk=100)
        # 0xD1 only: the acquisition stays open (a dead mid-stream sensor)
        sim.stream_acquisition(transport, x, truncate_after=1, now=WIRE_T0)
    svc.drain()
    caps = (len(svc._sample_fds), len(svc._mem_records))
    for mac in (macs[0], macs[-1]):
        transport.push(pk.encode_end_stream(x[100:], 2), mac)
    svc.drain()
    # Sync from an unrelated sensor flushes the epoch batch without popping
    # either completed sensor's decision entry.
    SensorSimulator(macs[1]).heartbeat(transport)
    svc.drain()
    results = {
        "evicted": copy.deepcopy(svc.fft_results.get(macs[0], {}).get("X")),
        "resident": copy.deepcopy(svc.fft_results.get(macs[-1], {}).get("X")),
    }
    svc.stop()
    return caps, results


def test_stranded_builder_cap_evicts_and_falls_back(tmp_path):
    """Past the 256-acquisition cap the oldest stranded builders/fds are
    dropped; an evicted acquisition that later completes is analyzed via
    the file re-parse with decisions identical to the memory-fed one."""
    caps, mem = _drive_eviction(tmp_path, "memory")
    assert caps[0] <= 256, f"kept-fd roster leaked past the cap: {caps[0]}"
    assert caps[1] == 256, f"builder roster should sit at the cap: {caps[1]}"
    _, fil = _drive_eviction(tmp_path, "file")
    for slot in ("evicted", "resident"):
        m, f = mem[slot], fil[slot]
        assert m is not None and f is not None, slot
        assert {k: v for k, v in m.items() if k not in _METRIC_KEYS} == \
               {k: v for k, v in f.items() if k not in _METRIC_KEYS}, slot
        assert abs(m["peak_freq_1"] - 30.0) < 0.7, (slot, m["peak_freq_1"])


def test_idle_fd_reap_at_sync_boundary(tmp_path):
    """Kept ingest fds of stalled mid-stream acquisitions close after two
    sync generations (the 256-sensor-scale fd accumulation, SCALE_r05);
    a reaped acquisition that resumes reopens lazily and analyzes fine."""
    import pytest

    from apda_fft_tpu.io import packets as pk

    if not native.available():
        pytest.skip("kept-fd path requires the native codec")
    svc, transport, _, _ = make_service(
        tmp_path, flush_mode="on_sync",
        gateway_extra={"analysis_feed": "memory"})
    fs = 250.0
    macs = [f"0013a20041e8{i:04x}" for i in range(8)]
    t = np.arange(200) / fs
    x = np.sin(2 * np.pi * 30.0 * t)
    for mac in macs:
        sim = SensorSimulator(mac, fs=fs, axis="X", chunk=100)
        sim.stream_acquisition(transport, x, truncate_after=1, now=WIRE_T0)
    svc.drain()
    assert len(svc._sample_fds) == len(macs)
    hb = SensorSimulator("0013a20041e9ffff")
    hb.heartbeat(transport)
    svc.drain()  # generation 1: written at gen 0, not yet idle-2 -> kept
    assert len(svc._sample_fds) == len(macs)
    hb.heartbeat(transport)
    svc.drain()  # generation 2: idle across two boundaries -> reaped
    assert len(svc._sample_fds) == 0
    # A reaped acquisition resumes: lazy reopen, decisions unaffected.
    transport.push(pk.encode_end_stream(x[100:], 2), macs[0])
    svc.drain()
    hb.heartbeat(transport)
    svc.drain()
    entry = svc.fft_results.get(macs[0], {}).get("X")
    assert entry is not None
    assert abs(entry["peak_freq_1"] - 30.0) < 0.7, entry["peak_freq_1"]
    svc.stop()


def _drive_same_second_restart(tmp_path, feed: str):
    """An interrupted acquisition restarted within the same second reuses
    the same filename: the 0xD1 truncates the file, the stale kept fd must
    be closed, and analysis must see ONLY the new acquisition."""
    sub = tmp_path / f"coll_{feed}"
    sub.mkdir()
    svc, transport, _, _ = make_service(
        sub, flush_mode="on_sync", gateway_extra={"analysis_feed": feed})
    fs = 250.0
    mac = "0013a20041e90001"
    t = np.arange(400) / fs
    x_old = np.sin(2 * np.pi * 12.0 * t)   # interrupted acquisition
    x_new = np.sin(2 * np.pi * 30.0 * t)   # same-second restart
    sim = SensorSimulator(mac, fs=fs, axis="X", chunk=100)
    sim.stream_acquisition(transport, x_old, truncate_after=2, now=WIRE_T0)
    sim.stream_acquisition(transport, x_new, now=WIRE_T0)  # same filename
    svc.drain()
    SensorSimulator("0013a20041e90002").heartbeat(transport)
    svc.drain()
    entry = copy.deepcopy(svc.fft_results.get(mac, {}).get("X"))
    svc.stop()
    return entry


def test_same_second_restart_analyzes_only_new_acquisition(tmp_path):
    mem = _drive_same_second_restart(tmp_path, "memory")
    fil = _drive_same_second_restart(tmp_path, "file")
    assert mem is not None and fil is not None
    assert {k: v for k, v in mem.items() if k not in _METRIC_KEYS} == \
           {k: v for k, v in fil.items() if k not in _METRIC_KEYS}
    # The old 12 Hz acquisition is gone; only the 30 Hz restart is analyzed.
    assert abs(mem["peak_freq_1"] - 30.0) < 0.7, mem["peak_freq_1"]
    freqs = [v for k, v in mem.items() if k.startswith("peak_freq_")]
    assert not any(abs(f - 12.0) < 0.7 for f in freqs), freqs


def test_builder_matches_file_reparse_bitwise(tmp_path):
    """Unit-level: a builder fed quantized appends returns the exact record
    load_sensor_log parses back from the file, including special values
    (inf/nan dropped) and the reference's subnormal quirk."""
    from apda_fft_tpu.io import halffloat

    rng = np.random.default_rng(3)
    lines = acquisition_header_lines(
        "16/08/2026, 09:00:00", "2g", "250 Hz", "X axis", "Synced",
        means=["21.500000", "0.010000", "0.010000", "0.980000"],
        humidity=0.5, baselines=(0.125, 0.0, 0.0),
    )
    path = tmp_path / "rec.log"
    with open(path, "w") as fh:
        fh.writelines(lines)
    builder = SensorLogBuilder(lines)
    specials = np.array([0x7C00, 0xFC00, 0x7C01, 0x0001, 0x8001],
                        np.uint16).astype(">u2").tobytes()
    for k in range(4):
        raw = halffloat.encode_halves(rng.normal(0, 0.1, 97)) + (
            specials if k == 2 else b"")
        q = native.append_half_payload_quantized(str(path), raw, 0.125)
        assert q is not None
        builder.append(q)
    mem = builder.finish()
    fil = load_sensor_log(path)
    assert mem is not None and fil is not None
    for field in ("timestamp", "sensitivity", "fs", "axis", "sync_type",
                  "is_synced", "temperature", "rms_x", "rms_y", "rms_z",
                  "humidity", "first_x", "first_y", "first_z"):
        assert getattr(mem, field) == getattr(fil, field)
    assert np.array_equal(np.asarray(mem.samples), np.asarray(fil.samples))
    # 5 special words: inf / signed-inf(quirk->+inf) / nan dropped, the
    # two subnormals kept.
    assert len(mem.samples) == 4 * 97 + 2


def test_empty_builder_finishes_none(tmp_path):
    """No sample bytes appended -> None, mirroring the loader's 5-line
    integrity check on a header-only file."""
    lines = acquisition_header_lines(
        "ts", "2g", "250 Hz", "X axis", "Synced",
        means=["0", "0", "0", "0"], humidity=0.0, baselines=(0, 0, 0))
    b = SensorLogBuilder(lines)
    assert b.finish() is None
    b.append(np.array([]))
    assert b.finish() is None
    path = tmp_path / "hdr.log"
    with open(path, "w") as fh:
        fh.writelines(lines)
    assert load_sensor_log(path) is None  # 4 lines < 5
