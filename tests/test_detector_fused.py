"""Fused select+scan Pallas detector vs the staged XLA path.

``prominence_select_scan_pallas`` runs candidate selection AND the
prominence/width scans in one VMEM-resident kernel; its decision math is
op-for-op the XLA path's (``prominence_select`` with argmax selection +
``_prominence_and_width``), so interpret mode must agree bit-for-bit on the
integer decisions and to float32 exactness on the carried values.  On-TPU
equivalence is covered by the hardware parity/fuzz gates like every other
backend (benchmarks/parity_tpu.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apda_fft_tpu.ops.detector_pallas import (
    prominence_peaks_fused_pallas,
    prominence_select_scan_pallas,
)
from apda_fft_tpu.ops.peaks_prominence import (
    _prominence_and_width,
    prominence_peaks,
    prominence_select,
)


def _spectra(b, h, seed, kind="modal"):
    """Half-spectrum magnitudes with a zeroed DC bin, float32."""
    rng = np.random.default_rng(seed)
    bins = np.arange(h, dtype=np.float64)
    if kind == "modal":
        x = np.zeros((b, h))
        for w in range(b):
            for _ in range(rng.integers(1, 5)):
                c = rng.uniform(4, h - 4)
                width = rng.uniform(0.8, 6.0)
                amp = rng.uniform(1.0, 40.0)
                x[w] += amp * np.exp(-0.5 * ((bins - c) / width) ** 2)
        x += rng.uniform(0.0, 0.3) * rng.random((b, h))
    elif kind == "noise":
        x = rng.random((b, h)) * 5.0
    elif kind == "flat":
        x = np.full((b, h), 2.5)
    else:  # ties: quantized so rounded-magnitude ties are everywhere
        x = np.round(rng.random((b, h)) * 30.0) / 10.0
    x[:, 0] = 0.0
    return jnp.asarray(x, jnp.float32)


def _xla_reference(mags, max_candidates):
    """Staged XLA path with the argmax selection the kernel replicates."""
    sel = jax.vmap(lambda m: prominence_select(m, max_candidates, "argmax"))(mags)
    cid, is_cand, cmag, _, std, n_cand = sel
    h = mags.shape[-1]
    iota = jnp.arange(h)
    proms, bins = jax.vmap(
        lambda m, c, p: jax.vmap(lambda j, pk: _prominence_and_width(m, iota, j, pk))(c, p)
    )(mags, cid, cmag)
    return cid, is_cand, cmag, proms, bins, std, n_cand


@pytest.mark.parametrize("kind", ["modal", "noise", "flat", "ties"])
@pytest.mark.parametrize("h", [128, 512])
def test_fused_select_scan_matches_xla_stages(kind, h):
    mags = _spectra(24, h, seed=hash((kind, h)) % 2**31, kind=kind)
    m = 16
    cid, is_cand, cmag, proms, bins, std, n_cand = prominence_select_scan_pallas(
        mags, m, block_windows=8, interpret=True
    )
    rcid, ris, rcmag, rproms, rbins, rstd, rn = _xla_reference(mags, m)

    np.testing.assert_array_equal(np.asarray(n_cand), np.asarray(rn))
    np.testing.assert_array_equal(np.asarray(cid), np.asarray(rcid))
    np.testing.assert_array_equal(np.asarray(is_cand), np.asarray(ris))
    np.testing.assert_array_equal(np.asarray(bins), np.asarray(rbins))
    # Same ops, but the kernel's row reductions may associate differently from
    # the vmapped XLA fusions -> allow float32 ulps on carried values.
    np.testing.assert_allclose(np.asarray(cmag), np.asarray(rcmag), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(proms), np.asarray(rproms), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), np.asarray(rstd), rtol=1e-6)


@pytest.mark.parametrize("kind", ["modal", "noise"])
def test_fused_full_detector_matches_staged(kind):
    h, m, k = 256, 12, 4
    mags = _spectra(17, h, seed=hash(kind) % 2**31, kind=kind)  # 17: exercises padding
    fs = jnp.float32(500.0)
    fused = prominence_peaks_fused_pallas(
        mags, fs, n_fft=2 * h, k=k, max_candidates=m, block_windows=8, interpret=True
    )
    ref = jax.vmap(
        lambda mg: prominence_peaks(mg, fs, n_fft=2 * h, k=k, max_candidates=m,
                                    selection="argmax")
    )(mags)

    np.testing.assert_array_equal(np.asarray(fused.count), np.asarray(ref.count))
    np.testing.assert_array_equal(np.asarray(fused.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(fused.n_candidates), np.asarray(ref.n_candidates))
    np.testing.assert_array_equal(np.asarray(fused.n_required), np.asarray(ref.n_required))
    np.testing.assert_allclose(np.asarray(fused.freq), np.asarray(ref.freq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.mag), np.asarray(ref.mag), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.damping), np.asarray(ref.damping), atol=1e-2)
    np.testing.assert_allclose(np.asarray(fused.q_factor), np.asarray(ref.q_factor), atol=1e-2)


def test_fused_budget_clamps_to_h():
    # max_candidates > H must clamp (m = min(m, h)) and still run.
    mags = _spectra(4, 128, seed=11, kind="noise")
    out = prominence_select_scan_pallas(mags, 256, block_windows=4, interpret=True)
    assert out[0].shape == (4, 128)


def test_fused_rejects_unaligned_h():
    mags = jnp.zeros((4, 96), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        prominence_select_scan_pallas(mags, 8, interpret=True)


def test_pipeline_routing_predicate(monkeypatch):
    from apda_fft_tpu.models import pipeline

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pipeline._route_fused_detector(2048, 12, "auto")
    assert not pipeline._route_fused_detector(2048, 2, "auto")  # below crossover
    assert not pipeline._route_fused_detector(100, 12, "auto")  # lane-unaligned
    assert not pipeline._route_fused_detector(2048, 12, "auto_spmd")  # mesh path
    monkeypatch.setenv("APDA_FUSED_DETECTOR", "0")
    assert not pipeline._route_fused_detector(2048, 12, "auto")
    monkeypatch.delenv("APDA_FUSED_DETECTOR")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not pipeline._route_fused_detector(2048, 12, "auto")


@pytest.mark.parametrize("budget", [12, (8, 16, 3)])
def test_flex_detect_routes_fused_and_matches_staged(monkeypatch, budget):
    """The detect stage with the fused route forced (interpret mode on CPU)
    decides identically to the staged XLA path, for the flat budget and the
    two-tier split.  A spy asserts the kernel actually ran (the stage is
    tested eagerly: under analyze_epoch's jit the routing decision is baked
    into the cached program, so a cache hit would make this vacuous)."""
    from apda_fft_tpu.models import pipeline
    from apda_fft_tpu.ops import detector_pallas

    h = 256
    mags = _spectra(12, h, seed=5, kind="modal")
    fs_flat = jnp.full((12,), 500.0, jnp.float32)
    staged = pipeline._flex_detect(
        mags, fs_flat, n_fft=2 * h, k=4, max_candidates=budget
    )

    calls = []
    real = detector_pallas.prominence_peaks_fused_pallas

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(detector_pallas, "prominence_peaks_fused_pallas", spy)
    monkeypatch.setattr(pipeline, "_route_fused_detector", lambda h_, b_, s_: True)
    routed = pipeline._flex_detect(
        mags, fs_flat, n_fft=2 * h, k=4, max_candidates=budget
    )
    assert calls
    for name in staged._fields:
        a, b = np.asarray(getattr(staged, name)), np.asarray(getattr(routed, name))
        if a.dtype.kind in "iub":
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6, err_msg=name)


def test_fused_flat_spectrum_has_no_candidates():
    mags = _spectra(6, 128, seed=3, kind="flat")
    cid, is_cand, cmag, proms, bins, std, n_cand = prominence_select_scan_pallas(
        mags, 8, block_windows=4, interpret=True
    )
    assert not bool(np.asarray(is_cand).any())
    np.testing.assert_array_equal(np.asarray(n_cand), np.zeros(6, np.int32))
    # Empty slots resolve to j=0 (the zeroed DC bin), like the XLA argmax path.
    np.testing.assert_array_equal(np.asarray(cid), np.zeros((6, 8), np.int32))
