"""Fused single-window pipeline kernels (latency mode).

At B=1 the batched pipeline is bound by fixed per-fusion dispatch overhead,
not compute: the rigid path measures ~61 us/window on TPU v5e of which the
greedy while_loop's ~3 data-dependent rounds of ~16 tiny fusions dominate
(docs/DESIGN.md "Single-window latency attribution"), and the flexible path
~23-30 us.  These kernels collapse the ENTIRE pipeline - mean-centering,
four-step matmul FFT, half-spectrum magnitudes, detector, finalize - into a
single Pallas kernel: one dispatch, everything VMEM-resident.

This is a latency play only: the batched XLA pipeline remains the throughput
path (B>=8 amortizes its dispatch overhead and wins on cross-window VPU
vectorization, like every previous Pallas-vs-XLA measurement in this repo).

Layout: the kernel receives the window pre-shaped ``[n1, n2]`` (m1-major,
``a[m1, m2] = x[m2 + n2*m1]``) so no lane-dim splits happen in-kernel.  The
four-step output ``[k1, k2]`` holds spectrum bin ``k = k1 + n1*k2``; the
detectors never need the flattened order - their masked reductions compare
against the bin-index matrix ``kmat`` directly, and the only k-adjacent
operation (the strict-local-max test) uses two sublane rolls with a
lane-carry select.

Decision semantics mirror ``ops.peaks_resolution`` / ``ops.peaks_prominence``
op for op (same masked-reduction forms, same rounding, same tie-breaks);
reduction *order* differs (2D tiles vs flat vectors), so thresholds can move
by f32 ulps - the oracle corpus and the adversarial fuzz suite gate
equivalence, exactly as they do for the XLA paths.

Reference parity anchors: ``metrics/fft_iterativa.py:74-88`` (front end),
``utils/get_peak_resolution.py:80-128`` and ``utils/get_peak_prominence.py:
149-226`` (detectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apda_fft_tpu.models.results import EpochResult
from apda_fft_tpu.ops.fft import _dft_tables, _twiddle_tables, is_pow2, next_pow2, split_pow2
from apda_fft_tpu.ops.peaks_prominence import (
    EXCLUSION_RATIO,
    MIN_PROM_RATIO,
)
from apda_fft_tpu.ops.peaks_resolution import (
    RESOLUTION_MIN,
    RESOLUTION_NORMALIZATION,
    _discard_count,
)

_HIGHEST = jax.lax.Precision.HIGHEST


def _front_end(x_ref, cs1_ref, twc_ref, tws_ref, c2h_ref, s2h_ref,
               n1: int, n2: int):
    """Centered four-step FFT -> half-spectrum magnitudes, all in VMEM.

    The six per-window matmuls are batched into THREE dots by row-stacking
    the DFT tables / intermediates (each output row is an independent dot
    product, so the per-row results are unchanged).  Measured neutral vs six
    dots on TPU v5e (10.8 vs 10.9 us whole-kernel) - kept for the simpler
    table plumbing; the kernel floor is fixed dispatch + the detector's
    serial reduction chain, not MXU op count.

    Returns (mags [n1, n2h], k1, kmat, h): bin k = k1 + n1*k2 lives at
    position (k1, k2); DC bin zeroed (``fft_iterativa.py:85``).
    """
    f32 = jnp.float32
    n = n1 * n2
    a = x_ref[:]
    # Full unpadded window: only the (zeroed) DC bin sees the centering
    # constant, but subtracting the mean keeps gravity-scale raw offsets from
    # injecting offset-scale f32 roundoff (models/pipeline.py center="auto").
    a = a - jnp.sum(a) / f32(n)
    # Step 1: [c1; s1] stacked -> br and bi in one dot.
    b = jnp.dot(cs1_ref[:], a, preferred_element_type=f32, precision=_HIGHEST)
    br = b[:n1]
    bi = b[n1:]
    twc = twc_ref[:]
    tws = tws_ref[:]
    cr = br * twc - bi * tws
    ci = br * tws + bi * twc
    # Step 3: [cr; ci] against each half-table -> the four products in two dots.
    s = jnp.concatenate([cr, ci], axis=0)
    p = jnp.dot(s, c2h_ref[:], preferred_element_type=f32, precision=_HIGHEST)
    q = jnp.dot(s, s2h_ref[:], preferred_element_type=f32, precision=_HIGHEST)
    dr = p[:n1] - q[n1:]
    di = q[:n1] + p[n1:]
    n2h = n2 // 2
    h = n1 * n2h
    k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2h), 0)
    k2 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2h), 1)
    kmat = k1 + n1 * k2
    mags = jnp.sqrt(dr * dr + di * di)
    mags = jnp.where(kmat == 0, f32(0), mags)
    return mags, k1, kmat, h


def _threshold(mags, h: int):
    """mean + 2*stdev (ddof=1) over all bins (``stats.noise_threshold``)."""
    f32 = jnp.float32
    mean = jnp.sum(mags) / f32(h)
    var = jnp.sum((mags - mean) ** 2) / f32(h - 1)
    std = jnp.sqrt(var)
    return mean + 2.0 * std, std


def _local_max(m, k1, kmat, h: int, n1: int):
    """Strict local maxima on interior bins, in (k1, k2) coordinates.

    k-order neighbors: k-1 = (k1-1, k2) with a lane carry to (n1-1, k2-1) at
    k1 == 0, and symmetrically for k+1.
    """
    n2h = m.shape[1]
    prev0 = pltpu.roll(m, 1, 0)
    prev = jnp.where(k1 > 0, prev0, pltpu.roll(prev0, 1, 1))
    # pltpu.roll requires non-negative shifts: roll by -1 == roll by dim-1.
    nxt0 = pltpu.roll(m, n1 - 1, 0)
    nxt = jnp.where(k1 < n1 - 1, nxt0, pltpu.roll(nxt0, n2h - 1, 1))
    interior = (kmat >= 1) & (kmat <= h - 2)
    return interior & (m > prev) & (m > nxt)


def _first_argmax(score, kmat, h: int):
    """(max value, first bin index attaining it) - jnp.argmax tie semantics."""
    peak = jnp.max(score)
    j = jnp.min(jnp.where(score == peak, kmat, h)).astype(jnp.int32)
    return peak, j


def _round_half_even(x):
    return jnp.round(x)


def _rigid_kernel(x_ref, cs1_ref, twc_ref, tws_ref, c2h_ref, s2h_ref, fs_ref,
                  idx_ref, freq_ref, mag_ref, refined_ref, cnt_ref, ncand_ref,
                  *, n1: int, n2: int, n_fft: int, k: int, refine: bool):
    f32 = jnp.float32
    i32 = jnp.int32
    mags, k1, kmat, h = _front_end(
        x_ref, cs1_ref, twc_ref, tws_ref, c2h_ref, s2h_ref, n1, n2
    )
    ds = fs_ref[0, 0] / f32(n_fft)
    thr, _ = _threshold(mags, h)
    lm0 = _local_max(mags, k1, kmat, h, n1)
    ncand_ref[0, 0] = jnp.sum((lm0 & (mags > thr)).astype(i32))

    slots = jax.lax.broadcasted_iota(i32, (1, k), 1)
    neg_inf = f32(-jnp.inf)

    def cond(st):
        return ~st[4]

    def body(st):
        m, count, idx, mag, _ = st
        eligible = _local_max(m, k1, kmat, h, n1) & (m > thr)
        found = jnp.any(eligible)
        score = jnp.where(eligible, m, neg_inf)
        peak, j = _first_argmax(score, kmat, h)

        # -3 dB width on the current (partially-zeroed) magnitudes; accepted
        # peaks' own widths are provably 0 (see ops/peaks_resolution.py), so
        # the Rayleigh term is 1.18*|di|/w_new for every accepted peak.
        half = f32(0.707) * peak
        at_or_below = m <= half
        left = jnp.max(jnp.where((kmat <= j) & at_or_below, kmat, 0))
        right = jnp.min(jnp.where((kmat >= j) & at_or_below, kmat, h))
        w_new = (right - left).astype(f32)
        di_ = jnp.abs(idx - j).astype(f32)
        rs = jnp.where(
            w_new != 0, f32(RESOLUTION_NORMALIZATION) * di_ / w_new, f32(0)
        )
        active = slots < count
        separated = jnp.all(~active | (rs >= f32(RESOLUTION_MIN)))

        take = found & separated
        write = take & (slots == count)
        idx = jnp.where(write, j, idx)
        mag = jnp.where(write, peak, mag)
        count = count + take.astype(i32)

        # Wipe round(freq*0.02/df) bins each side; pure-jnp helper shared
        # with the batched detector so the halves-snapping rule can't drift.
        nd = _discard_count(j.astype(f32) * ds, ds)
        start = jnp.maximum(0, j - nd)
        end = jnp.minimum(h, j + nd + 1)
        m = jnp.where(found & (kmat >= start) & (kmat < end), f32(0), m)

        done = ~found | (count >= k)
        return (m, count, idx, mag, done)

    init = (
        mags,
        jnp.asarray(0, i32),
        jnp.full((1, k), -1, i32),
        jnp.zeros((1, k), f32),
        jnp.asarray(False),
    )
    _, count, idx, mag, _ = jax.lax.while_loop(cond, body, init)

    idx_ref[:] = idx
    freq_ref[:] = jnp.where(idx >= 0, idx.astype(f32) * ds, f32(0))
    mag_ref[:] = mag
    refined_ref[:] = _refine_subbin(mags, kmat, idx, ds, h) if refine else jnp.zeros((1, k), f32)
    cnt_ref[0, 0] = count


def _refine_subbin(mags, kmat, idx, ds, h: int):
    """Parabolic sub-bin refinement (``models.pipeline.refine_subbin``)."""
    f32 = jnp.float32
    safe = jnp.clip(idx, 1, h - 2)  # (1, k)
    k_slots = idx.shape[-1]
    out = jnp.zeros((1, k_slots), f32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, k_slots), 1)
    for i in range(k_slots):
        s = jnp.max(jnp.where(slots == i, safe, 0))
        m0 = jnp.max(jnp.where(kmat == s - 1, mags, f32(-jnp.inf)))
        m1 = jnp.max(jnp.where(kmat == s, mags, f32(-jnp.inf)))
        m2 = jnp.max(jnp.where(kmat == s + 1, mags, f32(-jnp.inf)))
        denom = m0 - 2.0 * m1 + m2
        delta = jnp.where(jnp.abs(denom) > f32(1e-30), 0.5 * (m0 - m2) / denom, f32(0))
        delta = jnp.clip(delta, -0.5, 0.5)
        refined = (s.astype(f32) + delta) * ds
        out = jnp.where(slots == i, refined, out)
    return jnp.where(idx >= 0, out, f32(0))


def _flex_kernel(x_ref, cs1_ref, twc_ref, tws_ref, c2h_ref, s2h_ref, fs_ref,
                 idx_ref, freq_ref, mag_ref, prom_ref, damp_ref, q_ref, refined_ref,
                 cnt_ref, ncand_ref, nreq_ref,
                 *, n1: int, n2: int, n_fft: int, k: int, m_budget: int, refine: bool):
    f32 = jnp.float32
    i32 = jnp.int32
    mags, k1, kmat, h = _front_end(
        x_ref, cs1_ref, twc_ref, tws_ref, c2h_ref, s2h_ref, n1, n2
    )
    ds = fs_ref[0, 0] / f32(n_fft)
    thr, std = _threshold(mags, h)
    cand_mask = _local_max(mags, k1, kmat, h, n1) & (mags > thr)
    n_cand = jnp.sum(cand_mask.astype(i32))
    ncand_ref[0, 0] = n_cand

    neg_inf = f32(-jnp.inf)
    inf = f32(jnp.inf)
    slots = jax.lax.broadcasted_iota(i32, (1, k), 1)

    # Candidate selection fused with the per-candidate prominence/width
    # scans: the selection loop is statically unrolled, so each round's
    # (j, peak) scalars feed the scans directly (ops/peaks_prominence.py
    # prominence_select "argmax" + _prominence_and_width, evaluated against
    # kmat instead of a flat iota).  The selection SCORE is the 4-dp-rounded
    # magnitude with a first-index tie-break - the reference's stored-mag
    # stable sort order (get_peak_prominence.py:188,197) - while the raw
    # magnitude still drives the scans.
    scale4 = f32(10.0**4)
    work = jnp.where(cand_mask, _round_half_even(mags * scale4) / scale4, neg_inf)
    cands = []
    for _ in range(m_budget):
        peak, j = _first_argmax(work, kmat, h)
        is_cand = peak > neg_inf
        raw = jnp.max(jnp.where(kmat == j, mags, neg_inf))
        cmag = jnp.where(is_cand, raw, f32(0))  # invalid slots land on bin 0 (= 0)
        work = jnp.where(kmat == j, neg_inf, work)

        left = kmat < j
        right = kmat > j
        blocker = mags > cmag
        last_blk_left = jnp.max(jnp.where(blocker & left, kmat, -1))
        first_blk_right = jnp.min(jnp.where(blocker & right, kmat, h))
        min_left = jnp.minimum(
            cmag, jnp.min(jnp.where((kmat > last_blk_left) & left, mags, inf))
        )
        min_right = jnp.minimum(
            cmag, jnp.min(jnp.where((kmat < first_blk_right) & right, mags, inf))
        )
        prom = cmag - jnp.maximum(min_left, min_right)

        valley = cmag - prom
        target = valley + prom * f32(0.707)
        stop = (mags <= target) | (mags > cmag)
        left_idx = jnp.max(jnp.where(stop & (kmat <= j), kmat, 0))
        right_idx = jnp.min(jnp.where(stop & (kmat >= j), kmat, h - 1))
        bins = jnp.maximum(right_idx - left_idx, 1)
        cands.append((j, is_cand, cmag, prom, bins))

    # Finalize: physics filters + reference rounding + greedy shoulder
    # rejection (ops/peaks_prominence.py prominence_finalize, unrolled).
    def round_dec(x, decimals):
        scale = f32(10.0**decimals)
        return _round_half_even(x * scale) / scale

    count = jnp.asarray(0, i32)
    consumed = jnp.asarray(0, i32)
    acc_idx = jnp.full((1, k), -1, i32)
    acc_freq = jnp.zeros((1, k), f32)
    acc_mag = jnp.zeros((1, k), f32)
    acc_prom = jnp.zeros((1, k), f32)
    acc_damp = jnp.zeros((1, k), f32)
    acc_q = jnp.zeros((1, k), f32)
    for j, is_cand, cmag, prom, bins in cands:
        consumed = consumed + (count < k).astype(i32)
        width = bins.astype(f32) * ds
        fn = j.astype(f32) * ds
        q = fn / width
        damping = 1.0 / (2.0 * q)
        # Exact integer damping band (see prominence_finalize): d = bins/(2*j)
        # so d >= 1/1000 <=> 500*bins >= j, d <= 7/100 <=> 50*bins <= 7*j -
        # bit-faithful to the reference's float64 chain for dyadic rates,
        # removing the f32 boundary flip the round-2 fuzz carried.
        valid = (
            is_cand
            & (prom > f32(0.5) * std)
            & (width > 0)
            & (500 * bins.astype(i32) >= j.astype(i32))
            & (50 * bins.astype(i32) <= 7 * j.astype(i32))
        )
        freq_r = round_dec(fn, 4)
        mag_r = round_dec(cmag, 4)
        damp_r = round_dec(damping * 100.0, 2)
        q_r = round_dec(q, 2)

        # Zero-rounded magnitude -> ratio 0 (documented divergence: the
        # reference raises ZeroDivisionError and drops the whole window).
        safe_mag = jnp.where(mag_r > 0, mag_r, f32(1))
        prom_ratio = jnp.where(mag_r > 0, prom / safe_mag, f32(0))
        active = slots < count
        rel = jnp.abs(freq_r - acc_freq) / jnp.where(acc_freq != 0, acc_freq, f32(1))
        near = jnp.any(active & (rel < f32(EXCLUSION_RATIO)))
        take = valid & (count < k) & ~(near & (prom_ratio < f32(MIN_PROM_RATIO)))

        write = take & (slots == count)
        acc_idx = jnp.where(write, j, acc_idx)
        acc_freq = jnp.where(write, freq_r, acc_freq)
        acc_mag = jnp.where(write, mag_r, acc_mag)
        acc_prom = jnp.where(write, prom, acc_prom)
        acc_damp = jnp.where(write, damp_r, acc_damp)
        acc_q = jnp.where(write, q_r, acc_q)
        count = count + take.astype(i32)

    idx_ref[:] = acc_idx
    freq_ref[:] = acc_freq
    mag_ref[:] = acc_mag
    prom_ref[:] = acc_prom
    damp_ref[:] = acc_damp
    q_ref[:] = acc_q
    refined_ref[:] = _refine_subbin(mags, kmat, acc_idx, ds, h) if refine else jnp.zeros((1, k), f32)
    cnt_ref[0, 0] = count
    # Smallest budget deciding this window exactly (ops.peaks_prominence
    # prominence_finalize's n_required): slots consumed to the k-th
    # acceptance on a completed walk, else the full pre-budget count.
    nreq_ref[0, 0] = jnp.where(count >= k, consumed, n_cand)


def _latency_split(n: int) -> tuple[int, int]:
    """Four-step split for the latency kernel: the balanced ``split_pow2``.

    A VPU-tile-occupancy split (n1=8, wide lanes - fewer, fuller (8, 128)
    tiles per masked reduction) was measured and is SLOWER: 11.7 vs 10.8 us
    rigid N=1024, 13.0 vs 11.1 us flexible N=4096 on TPU v5e.  The kernel's
    reduction chain is bound by serial dependency latency, not per-op tile
    throughput, so partial tiles cost nothing and the balanced split's
    smaller tables win.
    """
    return split_pow2(n)


def _tables(n1: int, n2: int):
    import numpy as np

    c1, s1 = _dft_tables(n1, "float32")
    cs1 = jnp.asarray(np.concatenate([c1, s1], axis=0))
    twc, tws = (jnp.asarray(t) for t in _twiddle_tables(n1, n2, "float32"))
    c2f, s2f = _dft_tables(n2, "float32")
    n2h = n2 // 2
    c2h = jnp.asarray(c2f[:, :n2h])
    s2h = jnp.asarray(s2f[:, :n2h])
    return cs1, twc, tws, c2h, s2h


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "mode", "k", "max_candidates", "refine", "interpret"),
)
def analyze_window_lowlat(
    x: jnp.ndarray,
    fs,
    *,
    n_fft: int | None = None,
    mode: str = "rigid",
    k: int | None = None,
    max_candidates: int = 8,
    refine: bool = False,
    interpret: bool | None = None,
) -> EpochResult:
    """Analyze ONE full window in a single fused kernel dispatch.

    Latency-optimized single-window counterpart of
    ``models.pipeline.analyze_epoch``: same decision semantics, one Pallas
    kernel instead of ~50 fusions.  ``x`` is ``[N]`` or ``[1, N]`` with
    ``N == n_fft`` (full windows only - ragged/padded windows take the
    batched path).  Returns an :class:`EpochResult` with batch shape [1].

    ``max_candidates`` bounds the flexible detector exactly like the batched
    path's static budget; decisions are exact iff ``result.n_required <=
    max_candidates`` (the caller re-runs larger otherwise, mirroring the
    dynamic-budget contract).
    """
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 2:
        if x.shape[0] != 1:
            raise ValueError(f"latency path takes exactly one window, got {x.shape}")
        x = x[0]
    if x.ndim != 1:
        raise ValueError(f"expected [N] or [1, N] samples, got shape {x.shape}")
    n = x.shape[-1]
    if n_fft is None:
        n_fft = next_pow2(n)
    if n != n_fft:
        raise ValueError(
            f"latency path requires a full window (N == n_fft), got {n} vs {n_fft}"
        )
    if not is_pow2(n) or n < 64:
        raise ValueError(f"window length must be a power of two >= 64, got {n}")
    if mode not in ("flexible", "rigid"):
        raise ValueError(f"unknown mode {mode!r}; expected 'flexible' or 'rigid'")
    if k is None:
        k = 5 if mode == "rigid" else 4
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n1, n2 = _latency_split(n)
    tables = _tables(n1, n2)
    fs2 = jnp.reshape(jnp.asarray(fs, jnp.float32), (1, 1))
    a = x.reshape(n1, n2)

    vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    smem_scalar = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    kvec_shape = jax.ShapeDtypeStruct((1, k), jnp.float32)
    kvec_i_shape = jax.ShapeDtypeStruct((1, k), jnp.int32)
    scalar_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    in_specs = [vec() for _ in range(6)] + [smem_scalar()]

    if mode == "rigid":
        idx, freq, mag, refined, cnt, ncand = pl.pallas_call(
            functools.partial(
                _rigid_kernel, n1=n1, n2=n2, n_fft=n_fft, k=k, refine=refine
            ),
            in_specs=in_specs,
            out_specs=(
                vec(), vec(), vec(), vec(), smem_scalar(), smem_scalar(),
            ),
            out_shape=(
                kvec_i_shape, kvec_shape, kvec_shape, kvec_shape,
                scalar_shape, scalar_shape,
            ),
            interpret=interpret,
        )(a, *tables, fs2)
        zeros = jnp.zeros((1, k), jnp.float32)
        prom, damp, qf = zeros, zeros, zeros
        n_required = jnp.zeros_like(cnt[:, 0])  # rigid mode has no budget
    else:
        eff = min(max_candidates, n // 2)
        idx, freq, mag, prom, damp, qf, refined, cnt, ncand, nreq = pl.pallas_call(
            functools.partial(
                _flex_kernel, n1=n1, n2=n2, n_fft=n_fft, k=k,
                m_budget=eff, refine=refine,
            ),
            in_specs=in_specs,
            out_specs=(
                vec(), vec(), vec(), vec(), vec(), vec(), vec(),
                smem_scalar(), smem_scalar(), smem_scalar(),
            ),
            out_shape=(
                kvec_i_shape, kvec_shape, kvec_shape, kvec_shape, kvec_shape,
                kvec_shape, kvec_shape, scalar_shape, scalar_shape, scalar_shape,
            ),
            interpret=interpret,
        )(a, *tables, fs2)
        n_required = nreq[:, 0]

    return EpochResult(
        count=cnt[:, 0],
        idx=idx,
        freq=freq,
        mag=mag,
        prominence=prom,
        damping=damp,
        q_factor=qf,
        refined_freq=refined,
        n_candidates=ncand[:, 0],
        n_required=n_required,
    )
