"""Batched order statistics and moments with reference-stdlib semantics.

The reference numerical core leans on Python's ``statistics`` module:

* ``statistics.median`` for DC removal (reference ``metrics/fft_iterativa.py:10``):
  sort, and for even length average the two middle elements.
* ``statistics.mean`` / ``statistics.stdev`` (sample stdev, ddof=1) for the
  adaptive noise threshold (reference ``utils/get_peak_prominence.py:163-165``,
  ``utils/get_peak_resolution.py:88-90``).

These are re-expressed here as batched, jit-friendly JAX ops.  ``statistics``
uses exact rational arithmetic internally; on accelerator we use the array
dtype (float32 by default), which agrees to ~1 ulp of that dtype - the
acceptance tests quantify the resulting end-to-end decision fidelity.
"""

from __future__ import annotations

import jax.numpy as jnp


def median_lastaxis(x: jnp.ndarray, length: jnp.ndarray | None = None) -> jnp.ndarray:
    """Median over the last axis, optionally masked to a per-row valid prefix.

    Matches ``statistics.median``: for even counts, the mean of the two middle
    order statistics.  ``length`` (integer array broadcastable to ``x.shape[:-1]``)
    restricts each row to its first ``length`` entries, which is how ragged
    acquisition windows are handled (the reference computes the median of the
    *unpadded* sample list before zero-padding, ``metrics/fft_iterativa.py:74-79``).
    """
    n = x.shape[-1]
    if length is None:
        s = jnp.sort(x, axis=-1)
        lo = s[..., (n - 1) // 2]
        hi = s[..., n // 2]
        return (lo + hi) * jnp.asarray(0.5, x.dtype)

    length = jnp.asarray(length)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    idx = jnp.arange(n)
    s = jnp.sort(jnp.where(idx < length[..., None], x, big), axis=-1)
    lo = jnp.take_along_axis(s, ((length - 1) // 2)[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(s, (length // 2)[..., None], axis=-1)[..., 0]
    return (lo + hi) * jnp.asarray(0.5, x.dtype)


def mean_std_ddof1(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and sample standard deviation (ddof=1) over the last axis.

    Mirrors ``statistics.mean`` + ``statistics.stdev`` used for the detectors'
    dynamic noise threshold ``mean + 2*stdev``.
    """
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=-1) / jnp.asarray(n - 1, x.dtype)
    return mean[..., 0], jnp.sqrt(var)


def noise_threshold(mags: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``mean + 2*stdev`` dynamic threshold over the last axis; returns (threshold, std)."""
    mean, std = mean_std_ddof1(mags)
    return mean + 2.0 * std, std
