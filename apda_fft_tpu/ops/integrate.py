"""Frequency-domain integration: acceleration -> velocity / displacement.

Structural serviceability works in velocity and displacement, but the
sensors measure acceleration; the reference leaves the conversion to the
server side entirely.  Time-domain integration of a measured (offset-,
drift- and noise-contaminated) accelerometer signal diverges; the field
standard is omega-arithmetic in the frequency domain with a high-pass
cut: ``V(w) = A(w) / (iw)``, ``D(w) = -A(w) / w^2``, bins below the
cutoff zeroed.  One rfft -> scale -> irfft per record, batched; TPU
evaluates it as one jitted XLA FFT program.

Also provides the ISO 10816/20816-style *vibration severity* (band-limited
velocity RMS), computed directly from the velocity spectrum via Parseval -
no inverse transform, immune to the irfft's edge transients.

Units are the input's: acceleration in g integrates to g*s; multiply by
9806.65 for mm/s.  The gateway's ``vibration_severity`` option does that
conversion (sensor samples are g).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _tukey(n: int, alpha: float) -> np.ndarray:
    """Tukey (tapered-cosine) window, float64, flat over ``1 - alpha``."""
    t = np.arange(n) / (n - 1)
    w = np.ones(n)
    lo = t < alpha / 2
    w[lo] = 0.5 * (1.0 + np.cos(2.0 * np.pi / alpha * (t[lo] - alpha / 2)))
    hi = t >= 1.0 - alpha / 2
    w[hi] = 0.5 * (1.0 + np.cos(2.0 * np.pi / alpha * (t[hi] - 1.0 + alpha / 2)))
    return w


@functools.partial(jax.jit, static_argnames=("order", "n"))
def _integrate_impl(x, win, fs, f_hp, *, order: int, n: int):
    dtype = x.dtype
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    spec = jnp.fft.rfft(xc * win, axis=-1)
    freqs = jnp.fft.rfftfreq(n, d=1.0 / fs).astype(jnp.float32)
    w = 2.0 * jnp.pi * freqs
    # (iw)^-order with the DC/low-frequency bins (where 1/w blows up on
    # sensor offset + flicker noise) hard-cut at the high-pass edge.
    keep = freqs >= f_hp
    wsafe = jnp.where(w > 0, w, 1.0)
    scale = jnp.where(keep, wsafe ** (-order), 0.0)
    rot = (-1j) ** order  # 1/(iw) = -i/w
    return jnp.fft.irfft(spec * (rot * scale), n=n, axis=-1).astype(dtype)


def integrate_acceleration(
    x, fs, *, order: int = 1, f_highpass=None, edge_taper: float = 0.1
):
    """Integrate acceleration record(s) ``x`` (``[..., T]``) ``order`` times.

    Args:
      x: time records, last axis is time (input units, e.g. g).
      fs: sampling rate (Hz).
      order: 1 -> velocity, 2 -> displacement.
      f_highpass: cutoff below which content is discarded (Hz). Default
        ``4 * fs / T`` (four analysis-bin widths - enough to kill offset
        and drift without touching structural bands).
      edge_taper: Tukey-window alpha applied before the transform (0
        disables). Off-bin tones leak into low frequencies where the
        ``1/w^order`` scaling amplifies them enormously (measured: a 5x
        too-large displacement for an untapered off-bin tone, <1% with
        alpha=0.1); the taper distorts only the outer ``alpha/2`` of each
        end - read results from the flat middle.

    Returns:
      Integrated record(s), same shape, units ``input * s^order``.
    """
    x = jnp.asarray(x)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    n = x.shape[-1]
    if n < 8:
        raise ValueError("integration needs at least 8 samples")
    if order not in (1, 2):
        raise ValueError(f"order must be 1 (velocity) or 2 (displacement), got {order}")
    if not 0.0 <= edge_taper <= 1.0:
        raise ValueError(f"edge_taper must be in [0, 1], got {edge_taper}")
    fs = float(fs)
    f_hp = float(f_highpass) if f_highpass is not None else 4.0 * fs / n
    win = (jnp.asarray(_tukey(n, edge_taper), x.dtype) if edge_taper > 0
           else jnp.ones((n,), x.dtype))
    return _integrate_impl(x, win, fs, f_hp, order=order, n=n)


def velocity(x, fs, *, f_highpass=None, edge_taper: float = 0.1):
    """Velocity from acceleration (``order=1``); see ``integrate_acceleration``."""
    return integrate_acceleration(
        x, fs, order=1, f_highpass=f_highpass, edge_taper=edge_taper)


def displacement(x, fs, *, f_highpass=None, edge_taper: float = 0.1):
    """Displacement from acceleration (``order=2``); see ``integrate_acceleration``."""
    return integrate_acceleration(
        x, fs, order=2, f_highpass=f_highpass, edge_taper=edge_taper)


@functools.partial(jax.jit, static_argnames=("n",))
def _severity_impl(x, fs, f_lo, f_hi, *, n: int):
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    spec = jnp.fft.rfft(xc, axis=-1)
    freqs = jnp.fft.rfftfreq(n, d=1.0 / fs).astype(jnp.float32)
    w = 2.0 * jnp.pi * freqs
    band = (freqs >= f_lo) & (freqs <= f_hi) & (w > 0)
    vmag2 = jnp.where(band, jnp.abs(spec) ** 2 / jnp.where(w > 0, w, 1.0) ** 2, 0.0)
    # Parseval for the one-sided rfft of a real series: interior bins carry
    # their conjugate twins' power; DC is cut by the band, Nyquist (even n)
    # is its own twin.
    weight = jnp.full((n // 2 + 1,), 2.0, vmag2.dtype)
    weight = weight.at[0].set(1.0)
    if n % 2 == 0:
        weight = weight.at[-1].set(1.0)
    mean_sq = jnp.sum(vmag2 * weight, axis=-1) / (n * n)
    return jnp.sqrt(mean_sq)


def velocity_rms(x, fs, band=(10.0, 1000.0)):
    """Band-limited velocity RMS of acceleration record(s) - the ISO
    10816/20816 vibration-severity quantity.

    Computed from the velocity spectrum via Parseval (no inverse
    transform, no edge taper: leakage is power-conserving, the band cut
    excludes the 1/w-amplified low bins, and a window would need its own
    power correction for <0.1% gain).  ``band`` is ``(f_lo, f_hi)`` in Hz;
    ``f_hi`` is clamped to Nyquist.  Units: ``input * s`` RMS (g in ->
    g*s; x 9806.65 for the ISO mm/s).
    """
    x = jnp.asarray(x)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    n = x.shape[-1]
    if n < 8:
        raise ValueError("severity needs at least 8 samples")
    fs = float(fs)
    f_lo, f_hi = float(band[0]), min(float(band[1]), fs / 2.0)
    if not 0.0 < f_lo < f_hi:
        raise ValueError(f"need 0 < f_lo < f_hi <= fs/2, got {band}")
    return _severity_impl(x, fs, f_lo, f_hi, n=n)


G_TO_MMS2 = 9806.65  # 1 g in mm/s^2: converts g*s velocities to ISO mm/s
