"""Native (C++) data-loader kernels: build, parity vs Python, throughput sanity."""

import numpy as np
import pytest

from apda_fft_tpu.io import halffloat, native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_decode_parity_all_words(lib):
    words = np.arange(65536, dtype=np.uint32).astype(np.uint16)
    raw = words.astype(">u2").tobytes()
    got = native.decode_payload(raw, 0.25)
    ref = halffloat.decode_payload(raw, 0.25)
    nan_g, nan_r = np.isnan(got), np.isnan(ref)
    np.testing.assert_array_equal(nan_g, nan_r)
    np.testing.assert_array_equal(got[~nan_g], ref[~nan_r])


def test_format_parity(lib):
    rng = np.random.default_rng(0)
    vals = np.concatenate([rng.uniform(-10, 10, 500), [0.0, -0.0000005, 1e-7]])
    got = native.format_samples(vals)
    ref = "".join(s + ";" for s in halffloat.format_samples(vals))
    assert got == ref


def test_parse_parity_with_markers(lib):
    text = (
        "0.500000;-0.250000;nan;* MISSING PACKETS FROM 2 TO 3 *;0.750000;\n"
        "inf;1.250000;bad1.5;  2.5  ;;\n"
    )
    got = native.parse_samples(text)
    np.testing.assert_array_equal(got, [0.5, -0.25, 0.75, 1.25, 2.5])


def test_roundtrip_through_native_path(lib):
    rng = np.random.default_rng(1)
    vals = rng.uniform(-2, 2, 1024)
    payload = halffloat.encode_halves(vals)
    decoded = native.decode_payload(payload, first_value=0.125)
    text = native.format_samples(decoded)
    parsed = native.parse_samples(text)
    np.testing.assert_allclose(parsed, vals + 0.125, atol=2e-3)


def test_native_is_faster_than_python_formatting(lib):
    """Throughput sanity: native formatting should beat the pure-Python path."""
    import time

    vals = np.random.default_rng(2).uniform(-2, 2, 200_000)

    def best(fn, reps=3):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best(lambda: native.format_samples(vals))
    t_py = best(lambda: "".join(s + ";" for s in halffloat.format_samples(vals)))
    assert t_native < t_py, (t_native, t_py)
