"""Modal peak tracking across epochs."""

import numpy as np
import pytest

from apda_fft_tpu.models.tracking import PeakTracker, Track, match_peaks


def test_match_greedy_nearest_with_tolerance():
    pairs = match_peaks([10.0, 50.0], [50.2, 9.9, 200.0], rel_tol=0.02)
    assert sorted(pairs) == [(0, 1), (1, 0)]  # 10<->9.9, 50<->50.2; 200 unmatched
    assert match_peaks([10.0], [10.3], rel_tol=0.02) == []  # 3% off > 2% tol
    assert match_peaks([], [1.0]) == []
    assert match_peaks([1.0], []) == []


def test_match_each_side_used_once():
    # Two tracks close together, one new peak: only the nearest track gets it.
    pairs = match_peaks([25.0, 25.4], [25.39], rel_tol=0.02)
    assert pairs == [(1, 0)]


def test_tracker_follows_slow_drift():
    tracker = PeakTracker(rel_tol=0.02)
    # Mode 1 drifts 25.0 -> 24.0 Hz over 50 epochs (2 % slow loss of
    # stiffness); mode 2 stays at 47.7.
    for e in range(50):
        f1 = 25.0 - 0.02 * e
        tracker.update_freqs([f1, 47.7], t=e)
    tracks = tracker.tracks()
    assert len(tracks) == 2
    drifting = min(tracks, key=lambda tr: tr.mean_freq)
    assert len(drifting) == 50
    assert drifting.drift_hz == pytest.approx(-0.98, abs=1e-9)
    assert drifting.drift_relative == pytest.approx(-0.0392, abs=1e-4)
    stable = max(tracks, key=lambda tr: tr.mean_freq)
    assert stable.drift_hz == pytest.approx(0.0)


def test_relative_tolerance_does_not_truncate_scan():
    # The (10, 10.3) pair sorts first by absolute distance but fails its
    # relative window; the (1000, 1005) pair after it is valid and must
    # still be found (regression: an early break dropped it).
    assert match_peaks([10.0, 1000.0], [10.3, 1005.0], rel_tol=0.02) == [(1, 1)]


def test_padded_slots_keep_mags_aligned():
    tracker = PeakTracker()
    tracker.update_freqs([0.0, 12.3], [0.5, 7.7])
    (tr,) = tracker.tracks()
    assert tr.freqs == [12.3]
    assert tr.mags == [7.7]  # regression: the dropped slot's mag shifted in


def test_retired_tracks_leave_the_live_set():
    tracker = PeakTracker(max_missed=1)
    tracker.update_freqs([10.0])
    tracker.update_freqs([50.0])  # 10 Hz missed once -> retires next update
    tracker.update_freqs([50.0])
    assert len(tracker._tracks) == 1          # only the 50 Hz track is live
    assert len(tracker._archive) == 1         # 10 Hz kept as history
    assert len(tracker.tracks()) == 2         # both visible to the caller
    assert tracker.prune_archive(min_length=2) == 1
    assert tracker.tracks()[0].mean_freq == pytest.approx(50.0)


def test_tracker_births_and_retires():
    tracker = PeakTracker(rel_tol=0.02, max_missed=2)
    tracker.update_freqs([10.0])
    tracker.update_freqs([10.0, 30.0])   # 30 Hz mode appears
    for _ in range(3):
        tracker.update_freqs([30.0])     # 10 Hz mode vanishes
    tracker.update_freqs([10.05])        # near the retired track -> NEW track
    tracks = tracker.tracks()
    ten_hz = [tr for tr in tracks if abs(tr.mean_freq - 10.0) < 0.5]
    assert len(ten_hz) == 2              # original (retired) + reborn
    thirty = [tr for tr in tracks if abs(tr.mean_freq - 30.0) < 0.5][0]
    assert len(thirty) == 4


def test_alerts_flag_sustained_drift_and_serialize():
    import json

    tracker = PeakTracker()
    for e in range(20):
        tracker.update_freqs([25.0 * (1 - 0.002 * e), 47.7], t=e)
    alerted = tracker.alerts(rel_drift=0.02, min_length=5)
    assert len(alerted) == 1
    assert alerted[0].mean_freq < 26.0
    assert alerted[0].drift_relative == pytest.approx(-0.038, abs=1e-3)
    # Stable track does not alert; short noise tracks filtered by length.
    tracker.update_freqs([25.0 * (1 - 0.002 * 20), 47.7, 123.4])
    assert len(tracker.alerts(rel_drift=0.02)) == 1
    d = alerted[0].to_dict()
    json.dumps(d)  # serializable
    assert d["epochs"] == len(alerted[0]) and d["drift_hz"] < 0


def test_single_noisy_epoch_does_not_alert():
    tracker = PeakTracker()
    for _ in range(5):
        tracker.update_freqs([25.0])
    tracker.update_freqs([24.7])  # one -1.2% outlier within the match window
    assert tracker.alerts(rel_drift=0.01) == []  # median-vs-median is robust
    (tr,) = tracker.tracks()
    assert abs(tr.sustained_drift_relative()) < 0.01
    assert tr.drift_relative == pytest.approx(-0.012)  # raw endpoints differ


def test_alerts_scan_live_tracks_only():
    tracker = PeakTracker(max_missed=1)
    for e in range(6):
        tracker.update_freqs([25.0 * (1 - 0.01 * e)])
    # Kill the drifting track (two silent epochs) - retired tracks can't
    # receive data, so they must not keep alerting.
    tracker.update_freqs([90.0])
    tracker.update_freqs([90.0])
    assert tracker.alerts(rel_drift=0.02) == []


def test_to_dict_serializes_nonfloat_times():
    import datetime
    import json

    tracker = PeakTracker()
    tracker.update_freqs([10.0], t=np.float32(1.5))
    tracker.update_freqs([10.0], t=datetime.datetime(2026, 8, 17))
    (tr,) = tracker.tracks()
    d = json.loads(json.dumps(tr.to_dict()))
    assert d["times"][0] == 1.5 and "2026" in d["times"][1]


def test_update_uses_refined_frequencies_for_subbin_drift():
    from apda_fft_tpu.models.pipeline import analyze_epoch

    fs, n = 500.0, 4096
    t = np.arange(n) / fs
    df = fs / n
    tr_ref = PeakTracker()
    tr_bin = PeakTracker()
    # 0.04 Hz/epoch drift, well under one bin (df = 0.122 Hz).
    for e in range(4):
        x = np.sin(2 * np.pi * (12.3 + 0.04 * e) * t).astype(np.float32)
        res = analyze_epoch(x[None], fs, refine=True)
        tr_ref.update(res, t=e)
        tr_bin.update(res, t=e, use_refined=False)
    drift_ref = tr_ref.tracks()[0].drift_hz
    drift_bin = tr_bin.tracks()[0].drift_hz
    assert drift_ref == pytest.approx(0.12, abs=0.04)  # sub-bin drift seen
    # Bin path is quantized: drift is either 0 or a whole bin step (the
    # freq values carry the reference's 4-decimal rounding, hence 1e-3).
    assert min(abs(drift_bin), abs(drift_bin - df)) <= 1e-3


def test_tiny_history_cap_keeps_newest_and_honors_cap():
    # Regression: cap <= 8 used to delete the just-appended newest sample,
    # freezing the tail forever.
    for cap in (1, 4, 8):
        tracker = PeakTracker(history_cap=cap)
        for e in range(50):
            tracker.update_freqs([25.0 - 0.01 * e])
        (tr,) = tracker.tracks()
        assert len(tr) == cap
        assert tr.freqs[-1] == pytest.approx(25.0 - 0.49)  # newest retained
        assert tr.observed == 50


def test_archived_tracks_are_trimmed():
    tracker = PeakTracker(max_missed=1)
    for e in range(200):
        tracker.update_freqs([25.0 - 0.0001 * e])
    tracker.update_freqs([90.0])  # miss
    tracker.update_freqs([90.0])  # retire the 200-obs track
    archived = [t for t in tracker.tracks() if t.mean_freq < 50][0]
    assert len(archived) == PeakTracker.ARCHIVE_OBS_KEEP
    assert archived.observed == 200
    assert archived.freqs[0] == 25.0                       # baseline head
    assert archived.freqs[-1] == pytest.approx(25.0 - 0.0199)  # recent tail


def test_state_roundtrip_preserves_config_and_counts():
    tracker = PeakTracker(rel_tol=0.03, max_missed=2, history_cap=0)
    for e in range(5):
        tracker.update_freqs([10.0], t=e)
    d = tracker.to_dict()
    back = PeakTracker.from_dict(d)
    assert back.rel_tol == 0.03 and back.max_missed == 2
    assert back.history_cap == 0  # '0 disables' survives the round-trip
    (tr,) = back.tracks()
    assert tr.freqs == [10.0] * 5 and tr.observed == 5
    # Lean schema: no derived fields persisted.
    assert "mean_freq" not in d["tracks"][0]


def test_history_cap_preserves_drift_baseline():
    tracker = PeakTracker(history_cap=32)
    for e in range(100):
        tracker.update_freqs([25.0 - 0.001 * e])
    (tr,) = tracker.tracks()
    assert len(tr) == 32                 # trimmed to the cap
    assert tr.observed == 100            # true observation count retained
    assert tr.freqs[0] == 25.0           # drift baseline (head) preserved
    assert tr.freqs[-1] == pytest.approx(25.0 - 0.099)  # recent tail intact
    assert tr.drift_relative == pytest.approx(-0.099 / 25.0, rel=1e-6)
    assert tr.to_dict()["epochs"] == 100


def test_update_from_epoch_result():
    from apda_fft_tpu.models.pipeline import analyze_epoch

    fs, n = 500.0, 4096
    t = np.arange(n) / fs
    tracker = PeakTracker()
    for e in range(3):
        f1 = 12.3 + 0.01 * e
        x = (np.sin(2 * np.pi * f1 * t) + 0.6 * np.sin(2 * np.pi * 47.7 * t)
             ).astype(np.float32)
        res = analyze_epoch(x[None], fs, mode="flexible")
        tracker.update(res, t=e)
    tracks = tracker.tracks(min_length=3)
    assert len(tracks) == 2
    freqs = sorted(tr.mean_freq for tr in tracks)
    assert freqs[0] == pytest.approx(12.3, abs=0.1)
    assert freqs[1] == pytest.approx(47.7, abs=0.1)
