"""Command-line interface: batch-analyze sensor log files on TPU.

Usage:
    python -m apda_fft_tpu analyze FILE [FILE...] [--mode flexible|rigid|adaptive]
                                   [--backend xla|matmul|pallas] [--refine]
                                   [--taper none|hann|hamming|blackman] [--json]
    python -m apda_fft_tpu oracle-check FILE [FILE...]   # vs float64 oracle
    python -m apda_fft_tpu track FILE [FILE...] [--rel-drift R]  # modal drift
                                   # (exit 2 when a drift alert fires)

``analyze`` loads gateway-format acquisition logs (``io/logfile.py``), buckets
them by padded FFT length, and runs each bucket as one batched XLA program -
the CLI equivalent of the gateway's analysis stage.  ``oracle-check`` is the
validation harness: it re-runs each file through the pure-Python float64
reference oracle and reports decision agreement.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load(paths):
    from apda_fft_tpu.io.logfile import load_sensor_log

    loaded = []
    for path in paths:
        rec = load_sensor_log(path)
        if rec is None or not rec.samples:
            print(f"# skipping {path}: corrupt or empty", file=sys.stderr)
            continue
        loaded.append((path, rec))
    return loaded


def cmd_analyze(args) -> int:
    from apda_fft_tpu.models.batching import analyze_records

    loaded = _load(args.files)
    if not loaded:
        print("no analyzable files", file=sys.stderr)
        return 1

    records = [(np.asarray(rec.samples, np.float32), rec.fs) for _, rec in loaded]
    per_record = analyze_records(
        records, mode=args.mode, backend=args.backend, refine=args.refine,
        taper=args.taper,
    )
    for (path, rec), rp in zip(loaded, per_record):
        peaks = []
        for slot in range(rp.count):
            p = rp.peak(slot)
            # Host-float64 exact finisher; exact_freq recovers the per-window
            # detector in adaptive mode (rigid-fallback windows are
            # unrounded, prominence-served ones 4-dp rounded).
            p["freq"] = rp.exact_freq(slot, args.mode)
            if args.mode == "rigid":
                for drop in ("damping", "q_factor", "prominence"):
                    p.pop(drop)
            if not args.refine:
                p.pop("refined_freq")
            peaks.append(p)
        if args.json:
            print(json.dumps({"file": path, "fs": rec.fs, "axis": rec.axis,
                              "n_fft": rp.n_fft, "peaks": peaks}))
        else:
            print(f"{path} (fs={rec.fs} Hz, axis={rec.axis}, N={rp.n_fft}):")
            if not peaks:
                print("  no peaks above threshold")
            for p in peaks:
                line = f"  f={p['freq']:.4f} Hz  mag={p['mag']:.4f}"
                if "damping" in p:
                    line += f"  damping={p['damping']:.2f}%  q={p['q_factor']:.2f}"
                if "refined_freq" in p:
                    line += f"  refined={p['refined_freq']:.4f} Hz"
                print(line)
    return 0


def cmd_oracle_check(args) -> int:
    from apda_fft_tpu import analyze_epoch
    from apda_fft_tpu.ops.fft import next_pow2

    try:
        from tests.oracle import oracle_analyze  # repo-checkout validation tool
    except ImportError:
        print("oracle-check needs the repo checkout (tests/oracle.py); "
              "run it from the repository root", file=sys.stderr)
        return 2

    loaded = _load(args.files)
    mismatches = 0
    for path, rec in loaded:
        n_fft = next_pow2(len(rec.samples))
        for mode in ("flexible", "rigid"):
            ref = oracle_analyze(rec.samples, rec.fs, mode=mode)
            samples = np.zeros((1, n_fft), np.float32)
            samples[0, : len(rec.samples)] = rec.samples
            res = analyze_epoch(
                samples, rec.fs, n_fft=n_fft, mode=mode,
                lengths=np.array([len(rec.samples)]),
            )
            got = [int(i) for i in np.asarray(res.idx[0])[: int(res.count[0])]]
            want = [p["idx"] for p in ref]
            ok = got == want
            mismatches += 0 if ok else 1
            print(f"{path} [{mode}]: {'MATCH' if ok else f'MISMATCH got={got} want={want}'}")
    return 1 if mismatches else 0


def cmd_track(args) -> int:
    """Track modal peaks across a time-series of acquisition files."""
    import os as _os

    from apda_fft_tpu.gateway.egress import timestamp_from_filename
    from apda_fft_tpu.models.batching import analyze_records
    from apda_fft_tpu.models.tracking import PeakTracker

    loaded = _load(args.files)
    if not loaded:
        print("no analyzable files", file=sys.stderr)
        return 1
    # Chronological order via the embedded filename timestamp (gateway
    # format {mac}_{axis}axis_{d_m_Y_H_M_S}.log); undated files sort first
    # in their argv order (stable sort).
    def _when(pr):
        ts = timestamp_from_filename(_os.path.basename(pr[0]))
        return ts.timestamp() if ts else 0.0

    loaded.sort(key=_when)
    records = [(np.asarray(rec.samples, np.float32), rec.fs) for _, rec in loaded]
    per_record = analyze_records(records, mode=args.mode, refine=True)

    trackers: dict[str, PeakTracker] = {}
    for (path, rec), rp in zip(loaded, per_record):
        key = f"{_os.path.basename(path).split('_')[0]}/{rec.axis}"
        tracker = trackers.setdefault(key, PeakTracker())
        ts = timestamp_from_filename(_os.path.basename(path))
        freqs, mags = [], []
        for slot in range(rp.count):
            refined = float(rp.result.refined_freq[rp.row, slot])
            freqs.append(refined if refined > 0 else rp.exact_freq(slot, args.mode))
            mags.append(float(rp.result.mag[rp.row, slot]))
        tracker.update_freqs(freqs, mags, t=ts.timestamp() if ts else None)

    rc = 0
    for key, tracker in sorted(trackers.items()):
        print(f"{key}:")
        for tr in tracker.tracks(min_length=2):
            print(f"  track {tr.track_id}: {len(tr)} acquisitions, "
                  f"mean {tr.mean_freq:.3f} Hz, "
                  f"drift {tr.sustained_drift_relative() * 100:+.2f}%")
        for tr in tracker.alerts(rel_drift=args.rel_drift, min_length=args.min_epochs):
            print(f"  ALERT: mode near {tr.mean_freq:.3f} Hz drifted "
                  f"{tr.sustained_drift_relative() * 100:+.2f}% "
                  f"({tr.freqs[0]:.4f} -> {tr.freqs[-1]:.4f} Hz)")
            rc = 2
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="apda_fft_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("analyze", help="batch-analyze acquisition log files")
    a.add_argument("files", nargs="+")
    a.add_argument("--mode", default="flexible", choices=["flexible", "rigid", "adaptive"])
    a.add_argument("--backend", default="matmul", choices=["xla", "matmul", "pallas"])
    a.add_argument("--refine", action="store_true")
    a.add_argument("--taper", default="none",
                   choices=["none", "hann", "hamming", "blackman"])
    a.add_argument("--json", action="store_true")
    a.set_defaults(fn=cmd_analyze)

    o = sub.add_parser("oracle-check", help="validate device decisions vs float64 oracle")
    o.add_argument("files", nargs="+")
    o.set_defaults(fn=cmd_oracle_check)

    tr = sub.add_parser("track", help="track modal drift across acquisition files")
    tr.add_argument("files", nargs="+")
    tr.add_argument("--mode", default="flexible", choices=["flexible", "rigid", "adaptive"])
    tr.add_argument("--rel-drift", type=float, default=0.02,
                    help="alert threshold (relative sustained drift)")
    tr.add_argument("--min-epochs", type=int, default=5)
    tr.set_defaults(fn=cmd_track)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
