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
