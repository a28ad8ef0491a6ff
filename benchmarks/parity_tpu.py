"""On-hardware oracle parity: the round gate that runs BEFORE any benching.

Round 1's budget-truncation bug was visible only on real TPU hardware (CPU
tests all passed); this script makes that lesson a per-round gate instead of
a memory.  It drives the full production pipeline (dynamic candidate budget,
matmul backend, float32) on the attached device over the same randomized
modal-signal corpus as ``tests/test_peaks_match.py``, in both detector modes,
and compares peak decisions (indices + counts) against the float64 reference
oracle (``tests/oracle.py``, a clean-room restatement of
``utils/get_peak_prominence.py:149-226`` / ``get_peak_resolution.py:80-128``).

Prints ONE JSON line:
  {"metric": "oracle_parity_tpu", "pass": N, "fail": M, "total": T,
   "platform": "...", "ok": bool}

Exit status 0 iff every case matches.
"""

from __future__ import annotations

import json
import os
import sys

# Make the repo root importable regardless of invocation cwd
# (python benchmarks/parity_tpu.py puts benchmarks/ first on sys.path).
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def run_corpus() -> dict:
    import numpy as np

    from tests.oracle import oracle_analyze
    from tests.signals import modal_signal
    # Reuse the CPU suite's corpus AND its device-dispatch helper so this
    # gate can never silently diverge from the tests it mirrors.
    from tests.test_peaks_match import CORPUS, _run_device

    import jax
    import jax.numpy as jnp

    failures = []
    total = 0
    for mode in ("flexible", "rigid"):
        for n, fs, seed in CORPUS:
            total += 1
            x = modal_signal(n, fs, seed=seed)
            ref = oracle_analyze(x, fs, mode=mode)
            res, _n_fft = _run_device(x, fs, mode, jnp.float32)
            got_count = int(res.count[0])
            got_idx = [int(i) for i in np.asarray(res.idx[0])[:got_count]]
            ref_idx = [p["idx"] for p in ref]
            if got_idx != ref_idx:
                failures.append(
                    {"mode": mode, "n": n, "fs": fs, "seed": seed,
                     "got": got_idx, "want": ref_idx}
                )

    # Second section: the fused single-window latency kernel
    # (apda_fft_tpu.analyze_window_lowlat) over every full-pow2-window corpus
    # case (validated through N=65536 on hardware - docs/DESIGN.md).  The
    # budget mirrors the production routing contract exactly: re-run larger
    # iff n_required (the smallest exact budget) overflowed.  Past the
    # 64-slot cap the case is re-run
    # through analyze_epoch's OWN lowlat="auto" routing (sticky budget
    # cleared first so the kernel attempt is not skipped), executing the
    # production discard-and-fall-back handoff on hardware - never skipping
    # a case silently.
    from apda_fft_tpu.models.pipeline import _dynamic_budget, analyze_epoch
    from apda_fft_tpu.ops.latency_pallas import analyze_window_lowlat

    for mode in ("flexible", "rigid"):
        for n, fs, seed in CORPUS:
            if n & (n - 1):
                continue  # latency path: full pow2 windows only
            total += 1
            x = modal_signal(n, fs, seed=seed).astype(np.float32)
            ref = oracle_analyze(x, fs, mode=mode)
            budget = 8
            while True:
                res = analyze_window_lowlat(
                    x, fs, n_fft=n, mode=mode, max_candidates=budget
                )
                n_cand = int(res.n_candidates[0])
                n_req = int(res.n_required[0])
                # The budget bounds only the flexible detector's scan slots;
                # the rigid greedy loop is unbounded in the kernel.
                if mode == "rigid" or n_req <= budget or budget >= 64:
                    break
                budget = min(64, max(2 * budget, 1 << (n_req - 1).bit_length()))
            path = "lowlat"
            if mode == "flexible" and n_req > budget:
                # >64 candidates needed: exercise the real production
                # handoff - lowlat="auto" attempts the kernel, reads the
                # overflow back, discards, and re-runs the batched dynamic
                # path.  Clearing the sticky budget guarantees the kernel
                # attempt is not short-circuited by an earlier case.
                path = "lowlat-fallback"
                _dynamic_budget.pop((n, mode), None)
                res = analyze_epoch(x[None], fs, n_fft=n, mode=mode)
            got_count = int(res.count[0])
            got_idx = [int(i) for i in np.asarray(res.idx[0])[:got_count]]
            ref_idx = [p["idx"] for p in ref]
            if got_idx != ref_idx:
                failures.append(
                    {"mode": mode, "n": n, "fs": fs, "seed": seed, "path": path,
                     "got": got_idx, "want": ref_idx, "n_candidates": n_cand,
                     "budget": budget}
                )
    return {
        "metric": "oracle_parity_tpu",
        "pass": total - len(failures),
        "fail": len(failures),
        "total": total,
        "platform": jax.default_backend(),
        "ok": not failures,
        **({"failures": failures} if failures else {}),
    }


def main() -> None:
    from apda_fft_tpu.utils.watchdog import connect_with_watchdog

    connect_with_watchdog()
    report = run_corpus()
    print(json.dumps(report))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
