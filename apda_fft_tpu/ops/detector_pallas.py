"""Pallas TPU kernel for the prominence detector's per-candidate scans.

The XLA path evaluates the masked reductions for all ``max_candidates`` slots
of every window, valid or not (static shapes).  This kernel keeps each
window's half-spectrum VMEM-resident and runs the scans in a
``fori_loop`` bounded by the window's *actual* candidate count - real spectra
have ~5-15 candidates against a static budget of 32, so roughly half to
two-thirds of the scan work disappears.

Decision math is identical to ``peaks_prominence._prominence_and_width``
(same masked reductions, evaluated on an (8, H/8) tile view for full VPU
sublane utilization); equivalence is asserted in tests against both the XLA
path and the float64 oracle corpus.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apda_fft_tpu.ops.peaks_prominence import (
    ProminencePeaks,
    prominence_finalize,
    prominence_select,
)

_ROWS = 8  # sublane count of the tile view


def _scan_kernel(mags_ref, cid_ref, cmag_ref, nval_ref, prom_ref, bins_ref, *, h: int):
    tb = mags_ref.shape[0]
    hc = h // _ROWS
    row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, hc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, hc), 1)
    iota = row * hc + col
    m_count = prom_ref.shape[1]
    inf = jnp.float32(jnp.inf)

    def window_body(w, _):
        m = mags_ref[w]  # (8, H/8)
        prom_ref[w] = jnp.zeros((m_count,), jnp.float32)
        bins_ref[w] = jnp.ones((m_count,), jnp.int32)

        def cand_body(i, __):
            j = cid_ref[w, i]
            peak = cmag_ref[w, i]
            left = iota < j
            right = iota > j
            blocker = m > peak

            last_blk_left = jnp.max(jnp.where(blocker & left, iota, -1))
            first_blk_right = jnp.min(jnp.where(blocker & right, iota, h))
            min_left = jnp.minimum(
                peak, jnp.min(jnp.where((iota > last_blk_left) & left, m, inf))
            )
            min_right = jnp.minimum(
                peak, jnp.min(jnp.where((iota < first_blk_right) & right, m, inf))
            )
            prom = peak - jnp.maximum(min_left, min_right)

            valley = peak - prom
            target = valley + prom * jnp.float32(0.707)
            stop = (m <= target) | (m > peak)
            left_idx = jnp.max(jnp.where(stop & (iota <= j), iota, 0))
            right_idx = jnp.min(jnp.where(stop & (iota >= j), iota, h - 1))
            bins = jnp.maximum(right_idx - left_idx, 1)

            slot = jax.lax.broadcasted_iota(jnp.int32, (m_count,), 0) == i
            prom_ref[w] = jnp.where(slot, prom, prom_ref[w])
            bins_ref[w] = jnp.where(slot, bins, bins_ref[w])
            return __

        jax.lax.fori_loop(0, nval_ref[w, 0], cand_body, 0)
        return _

    jax.lax.fori_loop(0, tb, window_body, 0)


@functools.partial(jax.jit, static_argnames=("block_windows", "interpret"))
def prominence_scans_pallas(
    mags: jnp.ndarray,
    cid: jnp.ndarray,
    cmag: jnp.ndarray,
    n_valid: jnp.ndarray,
    block_windows: int = 256,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(prominence, width_bins) for the first ``n_valid`` candidates per window.

    mags [B, H] (H = pow2 >= 64), cid/cmag [B, M], n_valid [B].  Slots beyond
    ``n_valid`` return prominence 0 / bins 1 (they are masked by the caller).
    """
    b, h = mags.shape
    m_count = cid.shape[-1]
    if h % _ROWS:
        raise ValueError(f"H must be a multiple of {_ROWS}, got {h}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tb = min(block_windows, b) if b else block_windows
    pad = (-b) % tb
    if pad:
        mags = jnp.pad(mags, ((0, pad), (0, 0)))
        cid = jnp.pad(cid, ((0, pad), (0, 0)))
        cmag = jnp.pad(cmag, ((0, pad), (0, 0)))
        n_valid = jnp.pad(n_valid, ((0, pad),))
    bp = mags.shape[0]

    mags3 = mags.astype(jnp.float32).reshape(bp, _ROWS, h // _ROWS)
    nval2 = n_valid.astype(jnp.int32)[:, None]

    prom, bins = pl.pallas_call(
        functools.partial(_scan_kernel, h=h),
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, _ROWS, h // _ROWS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # Candidate metadata is read one scalar at a time with dynamic
            # indices -> SMEM (VMEM requires lane-aligned static indexing).
            pl.BlockSpec((tb, m_count), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, m_count), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, m_count), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, m_count), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, m_count), jnp.float32),
            jax.ShapeDtypeStruct((bp, m_count), jnp.int32),
        ),
        interpret=interpret,
    )(mags3, cid.astype(jnp.int32), cmag.astype(jnp.float32), nval2)
    return prom[:b], bins[:b]


def prominence_peaks_batch_pallas(
    mags: jnp.ndarray,
    fs: jnp.ndarray,
    n_fft: int,
    k: int = 4,
    max_candidates: int = 32,
    selection: str = "topk",
    interpret: bool | None = None,
) -> ProminencePeaks:
    """Batch-level prominence detection with the Pallas scan kernel.

    Same contract as ``vmap(prominence_peaks)`` over ``mags [B, H]``; the
    candidate selection and the finalize stage are the shared XLA
    implementations, only the scans run in the kernel.
    """
    sel = jax.vmap(lambda m: prominence_select(m, max_candidates, selection))(mags)
    cid, is_cand, cmag, _, std, n_cand = sel
    # Candidates are magnitude-sorted with invalid slots last, so the valid
    # ones form a prefix and a count is enough for the kernel's loop bound.
    n_valid = jnp.sum(is_cand, axis=-1).astype(jnp.int32)
    proms, bins = prominence_scans_pallas(
        mags, cid, cmag, n_valid, interpret=interpret
    )
    proms = proms.astype(mags.dtype)
    fs_b = jnp.broadcast_to(jnp.asarray(fs, mags.dtype), mags.shape[:1])
    return jax.vmap(
        lambda c, ic, cm, p, bn, f, s, nc: prominence_finalize(
            c, ic, cm, p, bn, f, n_fft, k, s, nc
        )
    )(cid, is_cand, cmag, proms, bins, fs_b, std, n_cand)


# ---------------------------------------------------------------------------
# Batch-vectorized fused select+scan kernel (the throughput detector)
# ---------------------------------------------------------------------------
#
# The kernel above serializes windows inside the kernel (a fori_loop over the
# tile's windows), which measured SLOWER than XLA's dense batched fusions:
# cross-window VPU vectorization is worth more than the skipped scan work
# (docs/DESIGN.md "Pallas detector kernel").  This kernel keeps the batch ON
# the sublane axis - every op is a [tb, H] elementwise / row-reduction, the
# exact regularity the XLA path compiles to - but runs ALL of selection +
# scans on a VMEM-resident tile.  The XLA path's stage boundaries each
# round-trip [B, H]-sized (selection rounds) or [B, M, H]-sized (scans)
# intermediates through HBM; here the spectrum tile is read from HBM once.
#
# Decision math is op-for-op the XLA path's (same masked reductions, same
# rounded-magnitude score, same first-index tie rule via min-index-of-max);
# reduction ORDER within a row may differ from XLA's fusion choices, so f32
# thresholds can move by ulps - gated by the same oracle-parity and fuzz
# suites that gate the XLA paths (interpret mode is bit-checked against
# prominence_select + _prominence_and_width in tests/test_detector_fused.py).


def _fused_kernel(mags_ref, cid_ref, cand_ref, cmag_ref, prom_ref, bins_ref,
                  std_ref, ncand_ref, *, h: int, m: int):
    x = mags_ref[...]  # [tb, H] float32
    tb = x.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, h), 1)
    inf = jnp.float32(jnp.inf)

    # Dynamic noise threshold: mean + 2*stdev (ddof=1), per row
    # (ops.stats.noise_threshold).
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / jnp.float32(h - 1)
    std = jnp.sqrt(var)
    thr = mean + 2.0 * std

    # Strict local maxima on interior bins (edge duplication is masked out by
    # the interior test, same as the XLA path's wrapped rolls).
    xm1 = jnp.concatenate([x[:, :1], x[:, : h - 1]], axis=-1)
    xp1 = jnp.concatenate([x[:, 1:], x[:, h - 1 :]], axis=-1)
    cand_mask = (
        (iota >= 1) & (iota <= h - 2) & (x > xm1) & (x > xp1) & (x > thr)
    )
    n_cand = jnp.sum(cand_mask.astype(jnp.int32), axis=-1, keepdims=True)
    # Live round count: past the tile-wide max candidate count every select
    # round is exhausted for every row and every scan round works on the
    # exhausted-slot configuration (cid 0, magnitude x[:, 0]) - those rounds
    # collapse to the post-loop fills below, bit-identically.  The big win is
    # the two-tier straggler pass: budget 128 vs ~85 actual candidates.
    n_live = jnp.minimum(jnp.max(n_cand), m)

    # Selection score: the reference sorts on the STORED 4-dp-rounded
    # magnitude with ascending-index tie-break (peaks_prominence.
    # prominence_select); min-index-of-max == argmax's first-index rule.
    score = jnp.where(
        cand_mask, jnp.round(x * jnp.float32(1e4)) / jnp.float32(1e4), -inf
    )

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, m), 1)
    zeros_m = jnp.zeros((tb, m), jnp.float32)

    def select_body(s, carry):
        work, cid, cand, cmag = carry
        mx = jnp.max(work, axis=-1, keepdims=True)  # [tb, 1]
        eq = work == mx
        j = jnp.min(jnp.where(eq, iota, h), axis=-1, keepdims=True)
        onehot = iota == j
        cmag_s = jnp.sum(jnp.where(onehot, x, 0.0), axis=-1, keepdims=True)
        write = slot_iota == s
        cid = jnp.where(write, j, cid)
        cand = jnp.where(write & (mx > -inf), 1, cand)
        cmag = jnp.where(write, cmag_s, cmag)
        work = jnp.where(onehot, -inf, work)
        return work, cid, cand, cmag

    # Exhausted select rounds (every row's work array already all -inf) write
    # cid 0 / cand 0 / cmag x[:, 0] into their slot; seeding cmag with
    # x[:, 0] makes the skipped rounds no-ops.
    _, cid, cand, cmag = jax.lax.fori_loop(
        0, n_live, select_body,
        (score, jnp.zeros((tb, m), jnp.int32), jnp.zeros((tb, m), jnp.int32),
         zeros_m + x[:, :1]),
    )

    def scan_at(j, peak):
        """(prominence, width_bins) [tb, 1] for per-row peak (j, peak)."""
        left = iota < j
        right = iota > j
        blocker = x > peak

        last_blk_left = jnp.max(
            jnp.where(blocker & left, iota, -1), axis=-1, keepdims=True
        )
        first_blk_right = jnp.min(
            jnp.where(blocker & right, iota, h), axis=-1, keepdims=True
        )
        min_left = jnp.minimum(
            peak,
            jnp.min(jnp.where((iota > last_blk_left) & left, x, inf),
                    axis=-1, keepdims=True),
        )
        min_right = jnp.minimum(
            peak,
            jnp.min(jnp.where((iota < first_blk_right) & right, x, inf),
                    axis=-1, keepdims=True),
        )
        prom = peak - jnp.maximum(min_left, min_right)

        valley = peak - prom
        target = valley + prom * jnp.float32(0.707)
        stop = (x <= target) | (x > peak)
        left_idx = jnp.max(
            jnp.where(stop & (iota <= j), iota, 0), axis=-1, keepdims=True
        )
        right_idx = jnp.min(
            jnp.where(stop & (iota >= j), iota, h - 1), axis=-1, keepdims=True
        )
        bins = jnp.maximum(right_idx - left_idx, 1)
        return prom, bins

    def scan_body(s, carry):
        prom_acc, bins_acc = carry
        slot = slot_iota == s
        j = jnp.sum(jnp.where(slot, cid, 0), axis=-1, keepdims=True)
        peak = jnp.sum(jnp.where(slot, cmag, 0.0), axis=-1, keepdims=True)
        prom, bins = scan_at(j, peak)
        prom_acc = jnp.where(slot, prom, prom_acc)
        bins_acc = jnp.where(slot, bins, bins_acc)
        return prom_acc, bins_acc

    prom, bins = jax.lax.fori_loop(
        0, n_live, scan_body, (zeros_m, jnp.ones((tb, m), jnp.int32))
    )
    # Slots past n_live all hold the exhausted configuration; one shared
    # scan replaces their (m - n_live) identical rounds.
    prom0, bins0 = scan_at(jnp.zeros((tb, 1), jnp.int32), x[:, :1])
    fill = slot_iota >= n_live
    prom = jnp.where(fill, prom0, prom)
    bins = jnp.where(fill, bins0, bins)

    cid_ref[...] = cid
    cand_ref[...] = cand
    cmag_ref[...] = cmag
    prom_ref[...] = prom
    bins_ref[...] = bins
    std_ref[...] = std
    ncand_ref[...] = n_cand


@functools.partial(
    jax.jit, static_argnames=("max_candidates", "block_windows", "interpret")
)
def prominence_select_scan_pallas(
    mags: jnp.ndarray,
    max_candidates: int,
    block_windows: int = 128,
    interpret: bool | None = None,
):
    """Fused candidate selection + prominence/width scans, one HBM read.

    ``mags [B, H]`` float32 -> ``(cid, is_cand, cmag, proms, bins, std,
    n_cand)`` with the same contract as ``prominence_select`` +
    ``_prominence_and_width`` vmapped over the batch: candidate slots sorted
    by 4-dp-rounded magnitude descending (index-ascending ties), invalid
    slots last.  Requires H a multiple of 128 (lane-aligned tiles).
    """
    b, h = mags.shape
    m = min(max_candidates, h)
    if h % 128:
        raise ValueError(f"H must be a multiple of 128, got {h}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # The kernel's live working set is ~5 [tb, H] f32 buffers (spectrum,
    # select work array, shifted copies, masks); clamp the tile so the
    # scoped-vmem stack stays under the 16 MB limit (measured: tb=512 at
    # H=2048 OOMs at 17.7 MB; tb=256 fits; tb=128 is the measured-fastest).
    vmem_rows = max((699_000 // h) // 8 * 8, 8)
    tb = max(min(block_windows, b, vmem_rows), 1)
    pad = (-b) % tb
    if pad:
        mags = jnp.pad(mags, ((0, pad), (0, 0)))
    bp = mags.shape[0]

    grid = (bp // tb,)
    row_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (tb, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_fused_kernel, h=h, m=m),
        grid=grid,
        in_specs=[row_spec(h)],
        out_specs=(
            row_spec(m), row_spec(m), row_spec(m), row_spec(m), row_spec(m),
            row_spec(1), row_spec(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), jnp.float32),
            jax.ShapeDtypeStruct((bp, m), jnp.float32),
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        ),
        interpret=interpret,
    )(mags.astype(jnp.float32))
    cid, cand, cmag, prom, bins, std, ncand = (o[:b] for o in out)
    return (
        cid,
        cand.astype(bool),
        cmag,
        prom,
        bins,
        std[:, 0],
        ncand[:, 0],
    )


def prominence_peaks_fused_pallas(
    mags: jnp.ndarray,
    fs: jnp.ndarray,
    n_fft: int,
    k: int = 4,
    max_candidates: int = 32,
    block_windows: int = 128,
    interpret: bool | None = None,
) -> ProminencePeaks:
    """Batched prominence detection with selection AND scans in one kernel.

    Same contract as ``vmap(prominence_peaks)(mags [B, H], fs [B])``; the
    finalize stage (physics filters + greedy shoulder rejection) stays on the
    shared XLA implementation over the small [B, M] outputs.
    """
    cid, is_cand, cmag, proms, bins, std, n_cand = prominence_select_scan_pallas(
        mags, max_candidates, block_windows=block_windows, interpret=interpret
    )
    proms = proms.astype(mags.dtype)
    cmag = cmag.astype(mags.dtype)
    fs_b = jnp.broadcast_to(jnp.asarray(fs, mags.dtype), mags.shape[:1])
    return jax.vmap(
        lambda c, ic, cm, p, bn, f, s, nc: prominence_finalize(
            c, ic, cm, p, bn, f, n_fft, k, s, nc
        )
    )(cid, is_cand, cmag, proms, bins, fs_b, std.astype(mags.dtype), n_cand)
