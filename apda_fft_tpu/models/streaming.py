"""Streaming epochs: frame continuous records into windows on-device.

BASELINE config 4 ("64-channel x 16-window streaming epoch, N=8192: fused
window->FFT->magnitude->peak pipeline, one XLA program"): instead of the
gateway assembling one file per acquisition, continuous per-channel records
are framed into (overlapping) windows with a gather inside the same jitted
program that analyzes them - nothing touches the host between raw record and
peak list.
"""

from __future__ import annotations

import jax.numpy as jnp

from apda_fft_tpu.models.pipeline import analyze_epoch
from apda_fft_tpu.models.results import EpochResult


def frame_records(records: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    """Frame ``[..., T]`` records into ``[..., W, window]`` views (strided gather).

    W = floor((T - window) / hop) + 1; windows may overlap (hop < window).
    """
    t = records.shape[-1]
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if window > t:
        raise ValueError(f"window {window} longer than record {t}")
    if hop < 1:
        raise ValueError("hop must be >= 1")
    w = (t - window) // hop + 1
    if hop == window:
        # Non-overlapping framing is a pure reshape (after trimming any
        # ragged tail) - no gather.  TPU gathers are expensive; measured on
        # cfg4 (64ch x 16win, N=8192) the reshape is +34% end to end.
        trimmed = records[..., : w * window]
        return trimmed.reshape(*records.shape[:-1], w, window)
    if w <= 256:
        # Overlapping windows with statically-known starts: W contiguous
        # slices stacked - XLA lowers to copies/concats, still no gather.
        # (Unrolls W slices at trace time, so cap it; beyond the cap fall
        # back to the general strided gather.)
        return jnp.stack(
            [records[..., s : s + window] for s in range(0, w * hop, hop)],
            axis=-2,
        )
    starts = jnp.arange(w) * hop
    idx = starts[:, None] + jnp.arange(window)[None, :]  # [W, window]
    return records[..., idx]


def analyze_stream(
    records,
    fs,
    window: int,
    hop: int | None = None,
    **kwargs,
) -> EpochResult:
    """Frame ``[C, T]`` (or ``[T]``) records and analyze every window.

    Returns an :class:`EpochResult` with batch shape ``[C, W]`` (or ``[W]``).
    ``kwargs`` pass through to :func:`analyze_epoch` (mode, backend, k, ...).
    """
    records = jnp.asarray(records)
    hop = window if hop is None else hop
    framed = frame_records(records, window, hop)
    return analyze_epoch(framed, fs, **kwargs)
