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
