"""Mixed-workload fault soak of the full gateway state machine.

The reference's only "multi-node test" was production itself (SURVEY.md
section 4).  This harness drives N simulated sensors through E epochs of
mixed traffic - clean acquisitions, dropped mid-stream packets, anomalous
closures (truncated streams), shock events, reduced-data packets - against
egress sinks that fail intermittently, then asserts the recovery
invariants the design promises:

* the service survives every epoch (no handler escape: one CRITICAL line
  would mean the catch-all parity with ``GT_FFT_v5.py:858`` broke),
* failed uploads are retried until sinks heal; once healed, every queue
  drains and no ``.log`` file is left stranded on disk (files still open
  mid-acquisition - e.g. a truncation in the final epoch whose closure
  waits for that sensor's next 0xD1 - are not stranded),
* every dropped-packet gap / truncated stream produces an "Anomalous
  closure" recovery line (the inline ``* MISSING PACKETS *`` /
  ``* INCOMPLETE TRANSMISSION *`` markers live in the acquisition files
  themselves, reference parity, and are upload-consumed),
* drift-tracker state on disk stays valid JSON throughout.

Run:  python benchmarks/soak.py [--sensors 16] [--epochs 12]
                                [--analysis epoch|welch] [--seed 0]
Prints one JSON summary line; exit 0 iff every invariant held.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def run_soak(
    n_sensors: int = 16,
    epochs: int = 12,
    analysis: str = "epoch",
    seed: int = 0,
    sink_fail_rate: float = 0.25,
    workdir: str | None = None,
    async_uploads: bool = False,
    full_features: bool = False,
) -> dict:
    from apda_fft_tpu.gateway.config import GatewayConfig
    from apda_fft_tpu.gateway.egress import FtpSink, HttpSink
    from apda_fft_tpu.gateway.service import GatewayService
    from apda_fft_tpu.gateway.transport import LoopbackTransport, SensorSimulator

    rng = np.random.default_rng(seed)
    # Separate stream for the temperature jitter: drawing it from `rng`
    # would shift the traffic-mix sequence for existing seeds (and it did -
    # seed 1's truncations moved into the final epoch, where no follow-up
    # stream exists to raise the anomalous-closure line).
    temp_rng = np.random.default_rng(seed + 990_001)
    workdir = workdir or tempfile.mkdtemp(prefix="apda_soak_")
    data_dir = os.path.join(workdir, "SHM_Data") + os.sep
    os.makedirs(data_dir, exist_ok=True)
    cfg_path = os.path.join(workdir, "gw.json")
    with open(cfg_path, "w") as fh:
        gw_cfg = {
            "logger_file": data_dir + "history.log",
            "device_file": data_dir + "devices.txt",
            "config_file": os.path.join(workdir, "config.txt"),
            "data_dir": data_dir,
            "is_flexibile_structure": True,
            "analysis": analysis,
            "welch_window": 512,
            "analyze_shock": True,
        }
        if full_features:
            # Everything on at once: the whole beyond-reference monitoring
            # surface must coexist under faulted traffic.
            gw_cfg.update({
                "drift_alert_rel": 0.02,
                "drift_temp_compensate": True,
                "fdd_report": True,
                "fdd_window": 256,
                "fdd_min_sensors": 2,
                "ssi_report": True,
                "ssi_block_rows": 12,
                "ssi_damping_alert": 0.8,
                "harmonic_check": True,
                "modal_decimate": True,
                "shock_srs": True,
                # ISO vibration severity per acquisition; the 12.3 Hz unit
                # tone integrates to ~90 mm/s, so the 50 mm/s threshold
                # exercises the edge-triggered alert latch on every sensor.
                "vibration_severity": True,
                "severity_band_hz": [5.0, 100.0],
                "severity_alert_mms": 50.0,
            })
        json.dump({"gateway": gw_cfg}, fh)
    open(os.path.join(workdir, "config.txt"), "w").close()

    healthy = {"on": False}  # sinks fail intermittently until the last epoch

    class FlakyFtp(FtpSink):
        def upload(self, addr, files, log):
            if not healthy["on"] and rng.random() < sink_fail_rate:
                return []
            return list(files)

    class FlakyHttp(HttpSink):
        def upload(self, addr, files, local_dir, fft_result, log):
            if not healthy["on"] and rng.random() < sink_fail_rate:
                return []
            return list(files)

    config = GatewayConfig.load(cfg_path)
    transport = LoopbackTransport()
    svc = GatewayService(
        config, transport, flush_mode="on_sync",
        ftp_sink=FlakyFtp(config.ftp, data_dir), http_sink=FlakyHttp(""),
        async_uploads=async_uploads, upload_timeout=10.0,
    )
    svc.start()

    macs = [f"0013a20041e7{i:04x}" for i in range(n_sensors)]
    counts = {"clean": 0, "dropped": 0, "truncated": 0, "shock": 0, "reduced": 0}
    t0 = time.perf_counter()

    for epoch in range(epochs):
        for i, mac in enumerate(macs):
            axis = "XYZ"[i % 3]
            # Full-features mode mixes ODRs (dyadic grid) so modal_decimate
            # has real cross-rate groups to fuse, and reports a daily
            # temperature swing for the compensated drift path.
            fs_i = 125.0 if (full_features and i % 2) else 250.0
            temp_i = 20.0 + 8.0 * np.sin(2 * np.pi * epoch / max(epochs, 1)) \
                + float(temp_rng.normal(0, 0.5))
            sim = SensorSimulator(mac, fs=fs_i, axis=axis, chunk=200,
                                  seed=seed * 1000 + epoch * 100 + i,
                                  temperature=temp_i)
            n = int(rng.choice([1000, 2048, 4000]))
            t = np.arange(n) / fs_i
            x = (np.sin(2 * np.pi * 12.3 * t)
                 + 0.5 * np.sin(2 * np.pi * (47.7 if fs_i > 200 else 31.4) * t)
                 + 0.3 * rng.standard_normal(n))
            total_pkts = 1 + max(1, -(-(n - 200) // 200))
            kind = rng.random()
            if kind < 0.70:
                sim.stream_acquisition(transport, x)
                counts["clean"] += 1
            elif kind < 0.80 and total_pkts >= 4:
                sim.stream_acquisition(
                    transport, x,
                    drop_packets={int(rng.integers(2, total_pkts))},
                )
                counts["dropped"] += 1
            elif kind < 0.90 and total_pkts >= 4:
                sim.stream_acquisition(
                    transport, x, truncate_after=int(rng.integers(2, total_pkts)),
                )
                counts["truncated"] += 1
            elif kind < 0.95:
                td = np.arange(256) / 250.0
                sim.shock_event(
                    transport,
                    np.exp(-2.0 * td) * np.sin(2 * np.pi * 20.0 * td),
                )
                counts["shock"] += 1
            else:
                sim.reduced_data(transport, x[:500])
                counts["reduced"] += 1
        # One sync per sensor per epoch: analysis batch + flaky upload flush.
        for mac in macs:
            SensorSimulator(mac).heartbeat(transport)
        svc.drain()

    # Heal the sinks; every sensor syncs until queues drain (bounded).
    # Async mode needs extra rounds: a sync only SUBMITS this sensor's batch
    # (at most one in flight each), and results land on later polls.
    healthy["on"] = True
    for _ in range(8 if async_uploads else 4):
        for mac in macs:
            SensorSimulator(mac).heartbeat(transport)
        svc.drain()
        if async_uploads and svc.uploader is not None:
            svc.uploader.drain(log=svc.history)
        if not any(svc.ftp_queue.get(m) or svc.api_queue.get(m) for m in macs):
            break
    svc.stop()

    wall = time.perf_counter() - t0
    history = open(config.logger_file).read()
    old = config.logger_file + ".old"
    if os.path.exists(old):
        history = open(old).read() + history
    still_open = {os.path.basename(p) for p in svc.open_file.values()}
    stranded = [f for f in os.listdir(data_dir) if f.endswith(".log")
                and not f.startswith("history") and f not in still_open]
    leftover_queues = {m: list(svc.ftp_queue.get(m, [])) + list(svc.api_queue.get(m, []))
                       for m in macs if svc.ftp_queue.get(m) or svc.api_queue.get(m)}
    drift_ok = True
    drift_path = os.path.join(data_dir, "drift_tracks.json")
    if os.path.exists(drift_path):
        try:
            json.load(open(drift_path))
        except Exception:  # noqa: BLE001
            drift_ok = False
    modal_ok = True
    modal_path = os.path.join(data_dir, "modal_tracks.json")
    if os.path.exists(modal_path):
        try:
            json.load(open(modal_path))
        except Exception:  # noqa: BLE001
            modal_ok = False

    result = {
        "metric": "gateway_fault_soak",
        "analysis": analysis,
        "async_uploads": async_uploads,
        "sensors": n_sensors,
        "epochs": epochs,
        "traffic": counts,
        "wall_s": round(wall, 1),
        "critical_lines": history.count("CRITICAL"),
        "anomalous_closures": history.count("Anomalous closure"),
        "stranded_files": len(stranded),
        "open_mid_acquisition": len(still_open),
        "undrained_queues": len(leftover_queues),
        "drift_state_valid": drift_ok,
        "modal_state_valid": modal_ok,
        "full_features": full_features,
        "fdd_lines": history.count("[FDD]"),
        "ssi_lines": history.count("[SSI]"),
        "srs_lines": history.count("Shock SRS:"),
        "severity_lines": history.count("Vibration severity"),
        "severity_alerts": history.count("vibration severity"),
        "loop_errors": history.count("Error in main loop"),
    }
    faults = counts["dropped"] + counts["truncated"]
    result["ok"] = (
        result["critical_lines"] == 0
        and result["loop_errors"] == 0
        and result["stranded_files"] == 0
        and result["undrained_queues"] == 0
        and drift_ok
        and modal_ok
        and (faults == 0 or result["anomalous_closures"] > 0)
        and (not full_features or (result["fdd_lines"] > 0
                                   and result["ssi_lines"] > 0
                                   and result["severity_lines"] > 0
                                   and result["severity_alerts"] > 0
                                   and (counts["shock"] == 0
                                        or result["srs_lines"] > 0)))
    )
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sensors", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--analysis", default="epoch", choices=["epoch", "welch"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--async-uploads", action="store_true")
    ap.add_argument("--full-features", action="store_true",
                    help="enable the whole monitoring surface (FDD/SSI "
                         "reports, harmonic check, mixed-ODR fusion, "
                         "temperature-compensated drift) during the soak")
    args = ap.parse_args()
    result = run_soak(args.sensors, args.epochs, args.analysis, args.seed,
                      async_uploads=args.async_uploads,
                      full_features=args.full_features)
    print(json.dumps(result))
    raise SystemExit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
