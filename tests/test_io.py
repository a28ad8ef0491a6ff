"""IO layer: half-float quirks, packet codec round trips, log file format."""

import math

import numpy as np
import pytest

from apda_fft_tpu.io import halffloat, logfile, packets


def _scalar_decode(word: int) -> float:
    """Independent scalar model of the reference decode (protocol_decoder.py:116-144)."""
    exp = (word & 0x7C00) >> 10
    sign = -1.0 if word & 0x8000 else 1.0
    mant = (word & 0x03FF) / 1024.0
    if exp == 31:
        return float("nan") if mant != 0 else float("inf")
    if exp == 0:
        return sign * 0.00006103515 * mant if mant != 0 else 0.0
    return sign * (2.0 ** (exp - 15)) * (1.0 + mant)


def test_half_decode_all_65536_words():
    words = np.arange(65536, dtype=np.uint32).astype(np.uint16)
    got = halffloat.decode_half_words(words)
    for w in range(0, 65536, 97):  # stride the space; plus exhaustive specials below
        expect = _scalar_decode(w)
        g = float(got[w])
        if math.isnan(expect):
            assert math.isnan(g)
        else:
            assert g == expect, f"word {w:#06x}: {g} != {expect}"
    # exhaustive over the special/subnormal bands
    for w in list(range(0x0000, 0x0400)) + list(range(0x7C00, 0x8000)) + list(
        range(0x8000, 0x8400)
    ) + list(range(0xFC00, 0x10000)):
        expect = _scalar_decode(w)
        g = float(got[w])
        if math.isnan(expect):
            assert math.isnan(g)
        else:
            assert g == expect, f"word {w:#06x}: {g} != {expect}"


def test_half_decode_quirks():
    # -inf decodes as +inf (reference quirk, protocol_decoder.py:140-141)
    assert float(halffloat.decode_half_words(np.array([0xFC00]))[0]) == float("inf")
    # subnormal uses truncated constant, not 2**-14
    v = float(halffloat.decode_half_words(np.array([0x0001]))[0])
    assert v == 0.00006103515 * (1 / 1024.0)
    assert v != 2.0**-14 * (1 / 1024.0)
    # negative zero decodes to +0.0
    assert float(halffloat.decode_half_words(np.array([0x8000]))[0]) == 0.0


def test_decode_samples_formatting():
    payload = halffloat.encode_halves(np.array([0.125, -1.5, 2.25]))
    strs = halffloat.decode_samples(payload, first_value=0.5)
    assert strs == ["0.625000", "-1.000000", "2.750000"]
    # odd trailing byte ignored
    strs2 = halffloat.decode_samples(payload + b"\x01", first_value=0.5)
    assert strs2 == strs


def test_encode_decode_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    vals = rng.uniform(-2, 2, 256)
    back = halffloat.decode_payload(halffloat.encode_halves(vals))
    np.testing.assert_allclose(back, vals, atol=2e-3)  # binary16 resolution


def test_sync_packet_roundtrip():
    p = packets.encode_sync_request(
        battery_v=3.3, rssi_db=72, temp_c=21.37, humidity=55.5,
        gps_status=1, errors={"362": 1, "mem": 2}, reset_bit=3,
    )
    info = packets.parse_sync_info(list(p))
    assert info.battery == pytest.approx(3.3, abs=1e-3)
    assert info.rssi == -72
    assert info.temp == pytest.approx(21.37, abs=1e-2)
    assert info.humidity == pytest.approx(55.5, abs=1e-2)
    assert info.gps_status == 1
    assert info.errors["362"] == 1 and info.errors["mem"] == 2
    assert info.reset_bit == 3


def test_start_stream_roundtrip():
    samples = np.array([0.5, -0.25, 0.75])
    p = packets.encode_start_stream(
        samples, fs=250.0, axis="Y", range_g="4g", sync_state=2,
        baselines=(0.1234567, -0.5, 1.0),
    )
    assert p[0] == packets.PACKET_START
    hdr = packets.parse_start_header(list(p))
    assert hdr.range == "4g"
    assert hdr.odr == "250 Hz"
    assert hdr.fs == 250.0
    assert hdr.axis_label == "Yaxis"
    assert hdr.axis_file == "Y axis"
    assert hdr.sync == "Synced2"
    assert hdr.baselines[0] == pytest.approx(0.1234567, abs=1e-7)
    assert hdr.baselines[1] == -0.5
    got = packets.decode_stream_samples(p, 31)
    np.testing.assert_allclose(got, samples, atol=1e-3)


def test_mid_end_packet_numbers():
    p2 = packets.encode_mid_stream(np.array([1.0]), number=513)
    assert p2[0] == packets.PACKET_MID
    assert packets.packet_number(list(p2)) == 513
    p3 = packets.encode_end_stream(np.array([1.0]), number=7)
    assert packets.packet_number(list(p3)) == 7


def test_build_sync_and_config_hex():
    from datetime import datetime, timezone

    now = datetime(2026, 8, 16, 10, 20, 30, 123000, tzinfo=timezone.utc)
    hexstr = packets.build_sync_packet(delay=4, now=now)
    # 0xA1 + yy mm dd hh 55 ss + ms + delay  (minute hardcoded to 55)
    assert hexstr == "a1" + "260816105530" + "007b" + "04"
    # non-legacy mode uses the real minute
    assert packets.build_sync_packet(4, now=now, legacy_minute55=False)[10:12] == "20"

    cfg = "2g 500Hz XY 8k 2h SYNC1 4g 250Hz Z 2k 10 1500 4 8g 50Hz ODR2 N"
    hexcfg = packets.build_config_packet(cfg, delay=2, now=now)
    assert hexcfg.startswith("a2")
    # config_shm = 2g|500Hz|XY|8k = 0x01|0x80|0x300|0x2000 = 0x2381
    assert hexcfg[20:24] == "2381"
    # fallback when config row too short
    assert packets.build_config_packet("2g 500Hz", delay=2, now=now).startswith("a1")


def test_logfile_roundtrip(tmp_path):
    path = tmp_path / "0013a20041e7f6b7_Xaxis_16_08_2026_10_20_30.log"
    logfile.write_acquisition_header(
        path, "10:20:30", "2g", "500 Hz", "X axis", "Synced",
        means=["22.010000", "0.012000", "0.013000", "0.980000"],
        humidity=45.5, baselines=(0.1, 0.2, 0.3),
    )
    logfile.append_samples(path, ["0.500000", "-0.250000", "nan", "0.750000"])
    logfile.append_marker(path, "* INCOMPLETE TRANSMISSION *;")
    logfile.append_samples(path, ["1.250000"])

    log = logfile.load_sensor_log(path)
    assert log is not None
    assert log.fs == 500.0
    assert log.sensitivity == "2g"
    assert log.axis == "X"
    assert log.sync_type == "Synced" and log.is_synced == 1.0
    assert log.temperature == 22.01
    assert log.humidity == 45.5
    assert log.first_x == 0.1
    # nan dropped, marker tokens skipped
    assert log.samples == [0.5, -0.25, 0.75, 1.25]


def test_logfile_too_short(tmp_path):
    p = tmp_path / "short.log"
    p.write_text("a;\nb;\n")
    assert logfile.load_sensor_log(p) is None


def test_time_fields_roundtrip_bcd():
    """Encoders pack time as BCD so the {:x} parsers print real clock values."""
    from datetime import datetime, timezone

    now = datetime(2026, 8, 16, 22, 45, 39, tzinfo=timezone.utc)
    info = packets.parse_sync_info(list(packets.encode_sync_request(now=now)))
    assert info.datetime == "26-8-16 22:45:39"
    hdr = packets.parse_start_header(
        list(packets.encode_start_stream(np.array([0.0]), now=now))
    )
    assert hdr.time == "22:45:39"
    shock = packets.parse_shock_header(list(packets.encode_shock(np.array([0.0]), now=now)))
    assert shock.time == "22:45:39"
