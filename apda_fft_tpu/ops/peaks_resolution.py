"""Branchless resolution-based peak detector ("rigid structures" mode).

Re-expresses the reference's destructive greedy loop
(``utils/get_peak_resolution.py:80-128``) as a ``lax.while_loop`` over a
mutable magnitude vector, jit-compatible and vmappable.

Semantics replicated exactly:

* dynamic threshold ``mean + 2*stdev`` (ddof=1) computed once on the original
  magnitudes (``:88-90``),
* each round picks the highest strict local maximum above threshold, first
  index winning ties (``:99-103``),
* -3 dB width measured against ``0.707 * peak`` absolute, scanning to the
  first bin at or below that level on each side (``:30-44``) - evaluated on
  the *current, partially-zeroed* magnitudes, including for already-accepted
  peaks (whose neighborhoods are zeroed, so their width is 0: the Rayleigh
  criterion then reduces to ``1.18*|di|/w_new >= 1.5``),
* acceptance requires resolution ``1.18*|di|/(w1+w2) >= 1.5`` against every
  accepted peak, with ``w1+w2 == 0`` counting as unresolvable (``:48-62``),
* whether or not the candidate is accepted, ``round(freq*0.02/df)`` bins on
  each side of it are zeroed before the next round (``:116-123``),
* the loop ends at k accepted peaks or when no candidate remains (``:94,124-126``);
  it always terminates because every round zeroes at least its own argmax bin.

Frequencies are returned unrounded (``freq = idx * fs/n``, ``:105``), matching
the reference's rigid-mode output.

Precision note: the reference computes ``round(freq*0.02/df)`` in float64 with
banker's rounding.  For the dyadic sampling rates the hardware uses
(31.25..500 Hz against power-of-two N) that expression lands exactly on
half-integers whenever ``idx % 25 == 0``; float32 would land an ulp away and
round differently.  We therefore snap near-half values to the exact half
before rounding (see ``_discard_count``), restoring bit-identical behavior for
dyadic rates.  For NON-dyadic rates the float64 expression itself sits an
ulp off the exact half (three inexact roundings), and the reference rounds
by that perturbation's direction - information float32 cannot recover.
:func:`rigid_half_corrections` computes those boundary cases on the host in
true float64 (only ``idx % 50 == 25`` can be affected) and the detector
applies them as a tiny per-window side table, restoring exactness for any
``fs``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from apda_fft_tpu.ops.stats import noise_threshold

RESOLUTION_NORMALIZATION = 1.18
RESOLUTION_MIN = 1.5
EXCLUSION_FRACTION = 0.02


class ResolutionPeaks(NamedTuple):
    """Top-k resolved peaks for one window (fixed k slots, ``count`` valid)."""

    count: jnp.ndarray  # [] int32
    idx: jnp.ndarray  # [k] int32, bin index (-1 for empty slots)
    freq: jnp.ndarray  # [k] unrounded idx * fs/n
    mag: jnp.ndarray  # [k] magnitude at pick time
    n_candidates: jnp.ndarray  # [] int32: initial local maxima above threshold


def _width_half_magnitude(
    m: jnp.ndarray, iota: jnp.ndarray, j: jnp.ndarray, peak_val: jnp.ndarray
) -> jnp.ndarray:
    """Reference ``width_half_magnitude`` (``get_peak_resolution.py:30-44``).

    Nearest index at or below ``0.707*m[j]`` on each side; left defaults to 0,
    right to H (one past the end), width = right - left.  ``peak_val`` must be
    ``m[j]``, passed in so the caller's reduction supplies it without a
    per-round gather (a scalar ``jnp.take`` lowers to a scalarized [B] gather
    under vmap - see docs/DESIGN.md "Gather-free candidate extraction").
    """
    h = m.shape[-1]
    half = jnp.asarray(0.707, m.dtype) * peak_val
    at_or_below = m <= half
    left = jnp.max(jnp.where((iota <= j) & at_or_below, iota, 0))
    right = jnp.min(jnp.where((iota >= j) & at_or_below, iota, h))
    return right - left


def _discard_count(freq: jnp.ndarray, ds: jnp.ndarray) -> jnp.ndarray:
    """``round(freq * 0.02 / df)`` with float64-faithful rounding at halves.

    Exact for dyadic sampling rates (where the float64 expression lands
    exactly on half-integers); for non-dyadic rates the exact-half cases
    (``idx % 50 == 25``) additionally need :func:`rigid_half_corrections`.
    """
    x = freq * jnp.asarray(EXCLUSION_FRACTION, freq.dtype) / ds
    doubled = x + x
    nearest = jnp.round(doubled)
    near_half = jnp.abs(doubled - nearest) < jnp.asarray(1e-3, freq.dtype)
    snapped = jnp.where(near_half, nearest * jnp.asarray(0.5, freq.dtype), x)
    return jnp.round(snapped).astype(jnp.int32)


def rigid_half_corrections(fs: float, n_fft: int) -> np.ndarray | None:
    """Host float64 wipe-width corrections for ``idx % 50 == 25`` boundaries.

    The reference wipe width is ``round((idx*df)*0.02/df)`` in float64
    (``get_peak_resolution.py:105,116-117``).  In exact arithmetic that is
    ``idx/50``: a half-integer iff ``idx % 50 == 25`` (integer iff
    ``idx % 50 == 0``), and otherwise >= 0.02 from any half - so only the
    half cases are rounding-sensitive.  For non-dyadic ``fs`` the float64
    roundings perturb the half by an ulp in a data-dependent direction that
    float32 on-device arithmetic cannot reproduce; this computes, per such
    boundary index, the difference between the true float64 rounding and
    the device's exact-half banker's rounding.

    Returns an int8 array indexed by ``idx // 50`` (i.e. entry ``q`` covers
    ``idx = 50*q + 25``), or None when every entry is zero - the dyadic
    case, where the device path is already exact and no table is shipped.
    ``fs`` must be the ORIGINAL float64 rate (pre any float32 cast).
    """
    h = n_fft // 2
    if h <= 25:
        return None
    ds = np.float64(fs) / np.float64(n_fft)
    j = np.arange(25, h, 50, dtype=np.float64)
    nd64 = np.round(((j * ds) * np.float64(EXCLUSION_FRACTION)) / ds)
    q = np.round((j - 25.0) / 50.0)
    base = q + (q % 2)  # banker's rounding of the exact half q + 0.5
    corr = (nd64 - base).astype(np.int8)
    return corr if corr.any() else None


def resolution_peaks(
    mags: jnp.ndarray,
    fs: jnp.ndarray,
    n_fft: int,
    k: int = 5,
    half_corr: jnp.ndarray | None = None,
) -> ResolutionPeaks:
    """Detect top-k resolution-separated peaks in one half-spectrum ``mags`` [H].

    Equivalent of ``get_top_peaks_resolution`` (``utils/get_peak_resolution.py:80-128``).
    vmap over leading axes for batches.  ``half_corr`` is the optional
    :func:`rigid_half_corrections` table for non-dyadic sampling rates
    (int8, indexed by ``idx // 50``).
    """
    h = mags.shape[-1]
    dtype = mags.dtype
    fs = jnp.asarray(fs, dtype)
    ds = fs / jnp.asarray(n_fft, dtype)
    iota = jnp.arange(h)
    slots = jnp.arange(k)

    thr, _ = noise_threshold(mags)
    interior = (iota >= 1) & (iota <= h - 2)
    initial_lm = interior & (mags > jnp.roll(mags, 1)) & (mags > jnp.roll(mags, -1))
    n_cand = jnp.sum(initial_lm & (mags > thr)).astype(jnp.int32)

    def cond(state):
        return ~state["done"]

    def body(state):
        m = state["m"]
        local_max = interior & (m > jnp.roll(m, 1)) & (m > jnp.roll(m, -1))
        eligible = local_max & (m > thr)
        found = jnp.any(eligible)
        score = jnp.where(eligible, m, -jnp.inf)
        j = jnp.argmax(score).astype(jnp.int32)
        # m[j] without a gather: score[j] is the maximum, and equals m[j]
        # exactly whenever a candidate exists (``found``); when none does,
        # every consumer below is gated on ``found`` so -inf is inert.
        peak_val = jnp.max(score)

        w_new = _width_half_magnitude(m, iota, j, peak_val)
        # The reference recomputes each accepted peak's width on the current
        # (partially-zeroed) magnitudes - but that value is *identically 0*:
        # every accepted bin s was zeroed by its own round's wipe
        # (start <= j < end always covers j), so half = 0.707*m[s] = 0 and
        # the nearest at-or-below index on both sides is s itself.  The
        # Rayleigh term thus reduces exactly to 1.18*|di|/w_new, and the k
        # per-round width scans are dropped (measured ~1.7x rigid-mode
        # speedup; decision-equivalence covered by the oracle corpus and
        # fuzz suite, which execute the reference's full recompute).
        wsum = jnp.broadcast_to(w_new, state["idx"].shape).astype(dtype)
        di = jnp.abs(state["idx"] - j).astype(dtype)
        rs = jnp.where(wsum != 0, jnp.asarray(RESOLUTION_NORMALIZATION, dtype) * di / wsum, 0.0)
        active = slots < state["count"]
        separated = jnp.all(~active | (rs >= RESOLUTION_MIN))

        take = found & separated
        write = take & (slots == state["count"])
        idx = jnp.where(write, j, state["idx"])
        mag = jnp.where(write, peak_val, state["mag"])
        count = state["count"] + take.astype(jnp.int32)

        freq = j.astype(dtype) * ds
        nd = _discard_count(freq, ds)
        if half_corr is not None:
            # Non-dyadic fs: the float64 reference's rounding at the exact-half
            # boundaries (j % 50 == 25) is supplied by the host-side table.
            q = jnp.minimum(j // 50, half_corr.shape[-1] - 1)
            onehot_q = jnp.arange(half_corr.shape[-1]) == q
            corr = jnp.sum(
                jnp.where(onehot_q, half_corr, jnp.zeros_like(half_corr))
            ).astype(jnp.int32)
            nd = jnp.where(j % 50 == 25, nd + corr, nd)
        start = jnp.maximum(0, j - nd)
        end = jnp.minimum(h, j + nd + 1)
        wipe = found & (iota >= start) & (iota < end)
        m = jnp.where(wipe, jnp.zeros((), dtype), m)

        done = ~found | (count >= k)
        return {"m": m, "count": count, "idx": idx, "mag": mag, "done": done}

    init = {
        "m": mags,
        "count": jnp.asarray(0, jnp.int32),
        "idx": jnp.full((k,), -1, jnp.int32),
        "mag": jnp.zeros((k,), dtype),
        "done": jnp.asarray(False),
    }
    final = jax.lax.while_loop(cond, body, init)

    freq = jnp.where(final["idx"] >= 0, final["idx"].astype(dtype) * ds, 0.0)
    return ResolutionPeaks(
        count=final["count"], idx=final["idx"], freq=freq, mag=final["mag"],
        n_candidates=n_cand,
    )
