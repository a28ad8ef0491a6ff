"""The five BASELINE.json benchmark configs, each as one JSON line.

Run on TPU hardware:  python benchmarks/run_all.py [--backend xla|matmul|pallas]

Baselines are the reference numerical core's measured single-CPU-core
throughputs (BASELINE.md); vs_baseline is this framework's speedup.
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


def _signal(n, channels=1, seed=42):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    base = np.sin(2 * np.pi * 12.3 * t) + 0.6 * np.sin(2 * np.pi * 47.7 * t) + 0.1
    return (base[None, :] + 0.05 * rng.standard_normal((channels, n))).astype(np.float32)


def run_config(num: int, backend: str) -> dict:
    import functools

    import jax.numpy as jnp

    from apda_fft_tpu.models.pipeline import _analyze_epoch_impl
    from apda_fft_tpu.models.streaming import frame_records
    from apda_fft_tpu.utils.benchtime import per_iteration_seconds

    def pipeline(mode, n_fft, k=None, refine=False):
        return functools.partial(
            _analyze_epoch_impl,
            n_fft=n_fft,
            mode=mode,
            k=k or (4 if mode == "flexible" else 5),
            backend=backend,
            max_candidates=32,
            refine=refine,
            has_lengths=False,
        )

    if num == 1:  # single-channel N=1024, rigid-mode peak pick
        n, b = 1024, 1
        x = jnp.asarray(_signal(n))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = pipeline("rigid", n)
        name = "cfg1_single_n1024_rigid"
    elif num == 2:  # single-channel N=4096 flexible + sub-bin refinement
        n, b = 4096, 1
        x = jnp.asarray(_signal(n))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = pipeline("flexible", n, refine=True)
        name = "cfg2_single_n4096_flexible_refined"
    elif num == 3:  # 8-sensor batch N=4096
        n, b = 4096, 8
        x = jnp.asarray(_signal(n, channels=b))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = pipeline("flexible", n)
        name = "cfg3_batch8_n4096_flexible"
    elif num == 4:  # 64ch x 16win streaming epoch, N=8192, fused framing
        n, c, wn = 8192, 64, 16
        records = jnp.asarray(_signal(n * wn, channels=c))
        fs = jnp.full((c, wn), FS, jnp.float32)
        base_fn = pipeline("flexible", n)
        fn = lambda r, f: base_fn(frame_records(r, n, n), f, None)  # noqa: E731
        x = records
        b = c * wn
        name = "cfg4_stream_64x16_n8192_fused"
    elif num == 5:  # long-record N=65536 multi-peak + sub-bin interpolation
        n, b = 65536, 1
        x = jnp.asarray(_signal(n))
        fs = jnp.full((b,), FS, jnp.float32)
        fn = pipeline("flexible", n, refine=True)
        name = "cfg5_long_n65536_refined"
    else:
        raise ValueError(num)

    if num == 4:
        sec = per_iteration_seconds(fn, x, fs)
        n_ref = 8192
    else:
        sec = per_iteration_seconds(lambda s, f: fn(s, f, None), x, fs)
        n_ref = n
    wps = b / sec
    ref = REFERENCE_WPS[n_ref]
    return {
        "metric": name + f"[{backend}]",
        "value": round(wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(wps / ref, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="matmul")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()

    from bench import _connect_with_watchdog

    _connect_with_watchdog()
    for num in (int(c) for c in args.configs.split(",")):
        try:
            print(json.dumps(run_config(num, args.backend)), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"# config {num} failed: {exc}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
