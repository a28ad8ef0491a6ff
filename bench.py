"""Headline benchmark: batched N=4096 FFT + flexible peak-detect throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N/103}

Baseline: the reference numerical core measures 103 windows/s at N=4096
(flexible mode, one CPU core; BASELINE.md).  Target: >=1000x on one TPU chip.

Run directly on TPU hardware (does not force the CPU platform).
Env knobs: APDA_BENCH_BATCH (default 2048), APDA_BENCH_BACKEND (default
matmul - the measured-fastest backend; set "auto" to sweep
xla/matmul/pallas and report the best), APDA_BENCH_REPS (default 10).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_WINDOWS_PER_SEC = 103.0  # reference, N=4096 flexible, 1 CPU core
N_FFT = 4096
FS = 500.0


def _make_batch(batch: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    t = np.arange(N_FFT) / FS
    base = np.sin(2 * np.pi * 12.3 * t) + 0.6 * np.sin(2 * np.pi * 47.7 * t) + 0.1
    return (base[None, :] + 0.05 * rng.standard_normal((batch, N_FFT))).astype(np.float32)


def _make_noisy_batch(batch: int) -> np.ndarray:
    """Realistic-worst-case epoch: broadband noise + 4 weak damped modes.

    The clean two-tone batch above settles the dynamic candidate budget at 2;
    unit-variance broadband noise puts the mean+2*std threshold in the thick
    of the noise floor, so the detector sees dozens-to-hundreds of candidates
    per window (budget >= 32) - the steady state a noisy deployment runs at.
    The headline must not quietly be read as universal (VERDICT r2 weak #1),
    so this leg is reported alongside it in the same JSON line.
    """
    rng = np.random.default_rng(1234)
    t = np.arange(N_FFT) / FS
    x = rng.standard_normal((batch, N_FFT)).astype(np.float64)
    for f, a, zeta in ((12.3, 0.9, 0.01), (47.7, 0.7, 0.008),
                      (88.4, 0.55, 0.015), (141.2, 0.45, 0.02)):
        phase = rng.uniform(0, 2 * np.pi, size=(batch, 1))
        x += a * np.sin(2 * np.pi * f * t[None, :] + phase) * np.exp(
            -zeta * 2 * np.pi * f * t[None, :]
        )
    return x.astype(np.float32)


def _throughput(backend: str, batch: int, reps: int, noisy: bool = False):
    """Windows/sec, amortizing host<->device round-trip latency.

    Remote-tunnel TPU attachments have a multi-ms dispatch+fetch floor, so a
    naive per-call timer measures latency, not throughput.  Instead the whole
    pipeline is repeated ``iters`` times inside one jitted ``fori_loop`` (with
    an iteration-dependent input perturbation so XLA cannot hoist it), and the
    per-iteration time is the slope between two iteration counts.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from apda_fft_tpu.models.pipeline import _analyze_epoch_impl, analyze_epoch

    samples = jnp.asarray(_make_noisy_batch(batch) if noisy else _make_batch(batch))
    fs = jnp.full((batch,), FS, jnp.float32)

    # Production path: the dynamic candidate budget.  One warmup epoch sizes
    # the sticky power-of-two budget from the data; steady-state then runs at
    # that budget (as a long-running gateway would), verified sufficient here.
    warm = analyze_epoch(samples, fs, n_fft=N_FFT, mode="flexible", backend=backend)
    n_cand_max = int(np.max(np.asarray(warm.n_candidates)))
    n_req_max = int(np.max(np.asarray(warm.n_required)))
    from apda_fft_tpu.models.pipeline import steady_state_max_candidates

    # The exact steady-state program a long-running gateway would execute for
    # this data: the flat sticky budget, or the learned two-tier split
    # (m_small, m_big, s_cap) - see docs/DESIGN.md "Two-tier candidate
    # budget".
    mc = steady_state_max_candidates(N_FFT, "flexible", batch)
    budget = mc if isinstance(mc, int) else mc[1]
    # Exactness invariant: the sticky budget covers n_required (the smallest
    # exact budget), which on noise is typically far below the pre-budget
    # candidate count - that gap is the n_required optimization's win.
    assert n_req_max <= budget, (n_req_max, budget)
    leg = "noisy" if noisy else "clean"
    print(f"# [{leg}] candidate budget {mc} (required {n_req_max}, "
          f"pre-budget candidates {n_cand_max})", file=sys.stderr)

    pipeline = functools.partial(
        _analyze_epoch_impl,
        n_fft=N_FFT,
        mode="flexible",
        k=4,
        backend=backend,
        max_candidates=mc,
        refine=False,
        has_lengths=False,
    )

    from apda_fft_tpu.utils.benchtime import per_iteration_seconds

    # The remote device's clock can oscillate between a fast and a degraded
    # state on a seconds timescale (post-crash recovery); benchtime's
    # per-call best-of-reps can't span that, so take the best of a few
    # well-separated measurement rounds (standard min-of-N timing).
    n_samples = int(os.environ.get("APDA_BENCH_SAMPLES", "3"))
    sec = min(
        per_iteration_seconds(lambda s, f: pipeline(s, f, None), samples, fs, reps=reps)
        for _ in range(max(n_samples, 1))
    )
    return batch / sec, mc, n_cand_max


def main() -> None:
    from apda_fft_tpu.utils.watchdog import connect_with_watchdog

    connect_with_watchdog()
    batch = int(os.environ.get("APDA_BENCH_BATCH", "2048"))
    reps = int(os.environ.get("APDA_BENCH_REPS", "10"))
    # matmul is the measured-fastest backend on TPU v5e; set
    # APDA_BENCH_BACKEND=auto to sweep all three.
    want = os.environ.get("APDA_BENCH_BACKEND", "matmul")

    backends = ["xla", "matmul", "pallas"] if want == "auto" else [want]
    best_backend, best, best_budget = None, 0.0, 0
    for backend in backends:
        try:
            tp, budget, _ = _throughput(backend, batch, reps)
        except Exception as e:  # noqa: BLE001 - report and move on to next backend
            print(f"# backend {backend} failed: {e}", file=sys.stderr)
            continue
        print(f"# backend {backend}: {tp:,.0f} windows/s", file=sys.stderr)
        if tp > best:
            best, best_backend, best_budget = tp, backend, budget

    if best_backend is None:
        raise SystemExit("all backends failed")

    out = {
        "metric": f"fft_peak_windows_per_sec_n{N_FFT}_flexible[{best_backend}]",
        "value": round(best, 1),
        "unit": "windows/s",
        "vs_baseline": round(best / BASELINE_WINDOWS_PER_SEC, 2),
        "candidate_budget": (
            best_budget if isinstance(best_budget, int) else best_budget[1]
        ),
    }
    if isinstance(best_budget, tuple):
        # Two-tier steady state: [m_small, s_cap] alongside the full budget.
        out["tier"] = [best_budget[0], best_budget[2]]
    # Noisy-spectrum leg (VERDICT r2 weak #1): same pipeline on broadband
    # noise + 4 damped modes, with 32+ pre-budget candidates per window.
    # Reported in the same line so the clean-signal headline can't be read
    # as universal.  Guarded: a failure degrades to omitting the leg, never
    # losing the headline.
    if os.environ.get("APDA_BENCH_NOISY", "1") != "0":
        try:
            tp_n, budget_n, n_cand_n = _throughput(
                best_backend, batch, reps, noisy=True
            )
            out["noisy"] = {
                "value": round(tp_n, 1),
                "vs_baseline": round(tp_n / BASELINE_WINDOWS_PER_SEC, 2),
                "candidate_budget": (
                    budget_n if isinstance(budget_n, int) else budget_n[1]
                ),
                "n_candidates_max": n_cand_n,
            }
            if isinstance(budget_n, tuple):
                out["noisy"]["tier"] = [budget_n[0], budget_n[2]]
            print(f"# noisy leg: {tp_n:,.0f} windows/s at budget {budget_n}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# noisy leg failed: {e}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
