"""Result containers for epoch analysis - pytrees of fixed-shape arrays."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EpochResult(NamedTuple):
    """Per-window top-k peak results for one acquisition epoch.

    All arrays share leading shape ``[..., ]`` = the window batch shape and a
    trailing ``k`` axis for peak slots; ``count`` says how many slots are
    valid per window.  Unused slots hold ``idx = -1`` and zeros elsewhere.

    This is the batched, array-ified analog of the per-file peak dictionaries
    the reference builds (``GT_FFT_v5.py:648-659``,
    ``utils/get_peak_prominence.py:187-194``,
    ``utils/get_peak_resolution.py:113``).
    """

    count: jnp.ndarray  # [...] int32
    idx: jnp.ndarray  # [..., k] int32 bin index, -1 = empty
    freq: jnp.ndarray  # [..., k] Hz (rounded to 4 decimals in flexible mode)
    mag: jnp.ndarray  # [..., k] (rounded to 4 decimals in flexible mode)
    prominence: jnp.ndarray  # [..., k] (flexible mode; zeros in rigid mode)
    damping: jnp.ndarray  # [..., k] percent (flexible mode; zeros in rigid)
    q_factor: jnp.ndarray  # [..., k] (flexible mode; zeros in rigid)
    refined_freq: jnp.ndarray  # [..., k] Hz, sub-bin interpolated (zeros if off)
    n_candidates: jnp.ndarray  # [...] int32: threshold-crossing local maxima per
    #: window, before the flexible detector's max_candidates budget.
    n_required: jnp.ndarray  # [...] int32: smallest flexible candidate budget
    #: that reproduces this window's decisions exactly - slots consumed up to
    #: the k-th acceptance when the greedy walk completed (the reference
    #: breaks there), else the full pre-budget candidate count.  Decisions are
    #: reference-exact iff n_required <= the budget used; the dynamic budget
    #: re-runs on exactly that condition.  Zeros in rigid mode (no budget).

    @property
    def k(self) -> int:
        return self.idx.shape[-1]

    def top_peak_freq(self) -> jnp.ndarray:
        """First-slot frequency per window, -1 where no peak (``peak_freq`` parity)."""
        has = self.count > 0
        return jnp.where(has, self.freq[..., 0], -1.0)

    def top_peak_mag(self) -> jnp.ndarray:
        has = self.count > 0
        return jnp.where(has, self.mag[..., 0], -1.0)
