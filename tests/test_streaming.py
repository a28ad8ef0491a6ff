"""Streaming epoch framing + fused analysis."""

import numpy as np
import jax.numpy as jnp
import pytest

from apda_fft_tpu.models.streaming import analyze_stream, frame_records
from tests.oracle import oracle_analyze
from tests.signals import modal_signal


def test_frame_records_shapes_and_content():
    rec = jnp.arange(20.0)
    f = frame_records(rec, window=8, hop=4)
    assert f.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(f[0]), np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(f[1]), np.arange(4.0, 12.0))
    # multi-channel keeps leading axes
    rec2 = jnp.stack([rec, rec + 100])
    f2 = frame_records(rec2, window=8, hop=8)
    assert f2.shape == (2, 2, 8)
    assert float(f2[1, 1, 0]) == 108.0


def test_frame_records_validation():
    with pytest.raises(ValueError, match="longer than record"):
        frame_records(jnp.arange(10.0), window=16, hop=4)
    with pytest.raises(ValueError, match="hop"):
        frame_records(jnp.arange(10.0), window=4, hop=0)


def test_analyze_stream_matches_per_window_oracle():
    fs = 500.0
    c, wn, n = 2, 3, 1024
    records = np.stack(
        [np.concatenate([modal_signal(n, fs, seed=10 * ch + w) for w in range(wn)])
         for ch in range(c)]
    )
    res = analyze_stream(records, fs, window=n, mode="flexible")
    assert res.count.shape == (c, wn)
    for ch in range(c):
        for w in range(wn):
            ref = oracle_analyze(records[ch, w * n : (w + 1) * n], fs, mode="flexible")
            got = [int(i) for i in np.asarray(res.idx[ch, w])[: int(res.count[ch, w])]]
            assert got == [p["idx"] for p in ref]


def test_analyze_stream_overlapping_hop():
    fs = 250.0
    x = modal_signal(2048, fs, modes=[(30.0, 1.0, 0.0)], seed=1)
    res = analyze_stream(x, fs, window=1024, hop=512, mode="flexible")
    assert res.count.shape == (3,)
    # the 30 Hz mode appears in every overlapping window
    for w in range(3):
        freqs = np.asarray(res.freq[w])[: int(res.count[w])]
        assert any(abs(f - 30.0) < 0.5 for f in freqs)
