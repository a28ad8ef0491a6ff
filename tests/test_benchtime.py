"""Amortized timing helper: explicit and adaptive paths (CPU, deterministic)."""

import jax.numpy as jnp

from apda_fft_tpu.utils.benchtime import per_iteration_seconds


def test_explicit_iters_path():
    x = jnp.ones((64, 64), jnp.float32)
    sec = per_iteration_seconds(lambda a: a @ a, x, iters=8, reps=2)
    assert sec > 0


def test_adaptive_path_terminates_and_is_positive():
    x = jnp.ones((32, 32), jnp.float32)
    # tiny op: forces the escalation loop; min_delta kept small so the test
    # finishes quickly while still exercising the growth logic
    sec = per_iteration_seconds(lambda a: a + 1.0, x, min_delta=0.005, max_iters=4096)
    assert sec > 0


def test_pipelined_wall_seconds_smoke():
    from apda_fft_tpu.utils.benchtime import pipelined_wall_seconds

    x = jnp.ones((16, 64), jnp.float32)
    sec = pipelined_wall_seconds(lambda a: a @ a.T, x, depth=4, reps=1)
    assert sec > 0


def test_parity_corpus_runner_smoke(monkeypatch):
    """The on-hardware parity gate's runner, on a 2-case corpus subset."""
    import benchmarks.parity_tpu as pt
    import tests.test_peaks_match as tpm

    monkeypatch.setattr(tpm, "CORPUS", tpm.CORPUS[:1])
    report = pt.run_corpus()
    assert report["total"] == 4  # 1 case x 2 modes x (batched + lowlat sections)
    assert report["ok"] and report["fail"] == 0
