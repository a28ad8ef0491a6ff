"""The five BASELINE.json benchmark configs, each as one JSON line.

Run on TPU hardware:  python benchmarks/run_all.py [--backend xla|matmul|pallas]

Baselines are the reference numerical core's measured single-CPU-core
throughputs (BASELINE.md); vs_baseline is this framework's speedup computed
from latency-amortized *device* time.  Each line also reports the per-call
``dispatch_ms`` (host->device round-trip; ~25 ms through the axon tunnel,
microseconds co-located), and small-batch configs add ``pipelined_wps`` -
wall throughput with 32 epochs in flight, the honest end-to-end number for a
streaming caller that never synchronizes between epochs.

Config 5 (N=65536) is benchmarked at batch 64: a single 65536-sample window
is ~1 ms of device work, far below the tunnel's jitter floor, so the B=1
number is latency-bound and meaningless as a throughput (round-1 measured an
18x spread); ``single_window`` reports its device latency separately.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Make the repo root importable regardless of invocation cwd
# (python benchmarks/run_all.py puts benchmarks/ first on sys.path).
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# windows/s of the reference core at each config's N (BASELINE.md).
REFERENCE_WPS = {1024: 478.0, 4096: 103.0, 8192: 48.0, 65536: 4.8}
FS = 500.0
PIPELINE_DEPTH = 32


def _signal(n, channels=1, seed=42):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    base = np.sin(2 * np.pi * 12.3 * t) + 0.6 * np.sin(2 * np.pi * 47.7 * t) + 0.1
    return (base[None, :] + 0.05 * rng.standard_normal((channels, n))).astype(np.float32)


def _production_pipeline(mode, n_fft, backend, x, fs, refine=False):
    """Partial of the impl at the budget the dynamic default would pick."""
    import functools

    from apda_fft_tpu.models.pipeline import (
        _analyze_epoch_impl,
        _dynamic_budget,
        analyze_epoch,
    )

    warm = analyze_epoch(x, fs, n_fft=n_fft, mode=mode, backend=backend, refine=refine)
    budget = _dynamic_budget.get((n_fft, mode), 8)
    n_req = int(np.max(np.asarray(warm.n_required)))
    assert n_req <= budget or mode == "rigid", (n_req, budget)
    return functools.partial(
        _analyze_epoch_impl,
        n_fft=n_fft,
        mode=mode,
        k=4 if mode != "rigid" else 5,
        backend=backend,
        max_candidates=budget,
        refine=refine,
        has_lengths=False,
    )


def run_config(num: int, backend: str) -> dict:
    import jax.numpy as jnp

    from apda_fft_tpu.models.streaming import frame_records
    from apda_fft_tpu.utils.benchtime import per_iteration_stats, pipelined_wall_seconds

    small_batch = False
    single_window = None
    lowlat = None
    if num == 1:  # single-channel N=1024, rigid-mode peak pick
        n, b = 1024, 1
        x = jnp.asarray(_signal(n))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = _production_pipeline("rigid", n, backend, x, fs)
        lowlat = ("rigid", n, x, fs, False)
        name = "cfg1_single_n1024_rigid"
        small_batch = True
    elif num == 2:  # single-channel N=4096 flexible + sub-bin refinement
        n, b = 4096, 1
        x = jnp.asarray(_signal(n))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = _production_pipeline("flexible", n, backend, x, fs, refine=True)
        lowlat = ("flexible", n, x, fs, True)
        name = "cfg2_single_n4096_flexible_refined"
        small_batch = True
    elif num == 3:  # 8-sensor batch N=4096
        n, b = 4096, 8
        x = jnp.asarray(_signal(n, channels=b))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = _production_pipeline("flexible", n, backend, x, fs)
        name = "cfg3_batch8_n4096_flexible"
        small_batch = True
    elif num == 4:  # 64ch x 16win streaming epoch, N=8192, fused framing
        n, c, wn = 8192, 64, 16
        records = jnp.asarray(_signal(n * wn, channels=c))
        fs = jnp.full((c, wn), FS, jnp.float32)
        framed = frame_records(records, n, n)
        base_fn = _production_pipeline("flexible", n, backend, framed, fs)
        fn = lambda r, f: base_fn(frame_records(r, n, n), f, None)  # noqa: E731
        x = records
        b = c * wn
        name = "cfg4_stream_64x16_n8192_fused"
    elif num == 5:  # long-record N=65536 multi-peak + sub-bin interpolation
        n, b = 65536, 64
        x = jnp.asarray(_signal(n, channels=b))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = _production_pipeline("flexible", n, backend, x, fs, refine=True)
        # Device latency of one window, reported alongside (latency-bound
        # through a tunnel; the batched number is the throughput headline).
        x1 = jnp.asarray(_signal(n))
        fs1 = jnp.full((1,), FS, jnp.float32)
        st1 = per_iteration_stats(lambda s, f: fn(s, f, None), x1, fs1)
        single_window = {
            "device_ms": round(st1["per_iter_s"] * 1e3, 3),
            "note": "B=1 wall time is dispatch-latency-bound; see dispatch_ms",
        }
        name = "cfg5_long_n65536_b64_refined"
    else:
        raise ValueError(num)

    if num == 4:
        st = per_iteration_stats(fn, x, fs)
        n_ref = 8192
    else:
        st = per_iteration_stats(lambda s, f: fn(s, f, None), x, fs)
        n_ref = n
    wps = b / st["per_iter_s"]
    out = {
        "metric": name + f"[{backend}]",
        "value": round(wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(wps / REFERENCE_WPS[n_ref], 2),
        "device_ms": round(st["per_iter_s"] * 1e3, 3),
        "dispatch_ms": round(st["dispatch_s"] * 1e3, 1),
    }
    if small_batch:
        wall = pipelined_wall_seconds(
            lambda s, f: fn(s, f, None), x, fs, depth=PIPELINE_DEPTH
        )
        out["pipelined_wps"] = round(b / wall, 1)
        out["pipelined_depth"] = PIPELINE_DEPTH
    if lowlat is not None:
        # The production single-window path: the fused whole-pipeline Pallas
        # kernel (apda_fft_tpu.analyze_window_lowlat) - one dispatch instead
        # of ~50 fusions; measured 4.8-6.1x the B=1 XLA pipeline on TPU v5e.
        # It becomes the headline value for the single-window configs; the
        # batched pipeline's B=1 numbers stay in batched_* for attribution.
        from apda_fft_tpu.models.pipeline import _dynamic_budget
        from apda_fft_tpu.ops.latency_pallas import analyze_window_lowlat

        ll_mode, ll_n, ll_x, ll_fs, ll_refine = lowlat
        budget = _dynamic_budget.get((ll_n, ll_mode), 8)
        ll_fn = lambda s, f: analyze_window_lowlat(  # noqa: E731
            s[0], f[0], n_fft=ll_n, mode=ll_mode, refine=ll_refine,
            max_candidates=budget,
        )
        st_ll = per_iteration_stats(ll_fn, ll_x, ll_fs)
        ll_wps = b / st_ll["per_iter_s"]
        out.update(
            batched_value=out["value"],
            batched_vs_baseline=out["vs_baseline"],
            batched_device_ms=out["device_ms"],
            value=round(ll_wps, 1),
            vs_baseline=round(ll_wps / REFERENCE_WPS[n_ref], 2),
            device_ms=round(st_ll["per_iter_s"] * 1e3, 4),
            lowlat_kernel=True,
        )
    if single_window:
        out["single_window"] = single_window
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="matmul")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()

    from apda_fft_tpu.utils.watchdog import connect_with_watchdog

    connect_with_watchdog()
    failures = 0
    for num in (int(c) for c in args.configs.split(",")):
        try:
            print(json.dumps(run_config(num, args.backend)), flush=True)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"# config {num} failed: {exc}", file=sys.stderr, flush=True)
    if failures:
        # Missing BASELINE lines must not read as a clean round to automation.
        raise SystemExit(1)


if __name__ == "__main__":
    main()
