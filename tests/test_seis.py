# -*- coding: utf-8 -*-
"""
Seismic data layer tests: UTCDateTime semantics, miniSEED round trips
(STEIM1/2 + fallback), merges, SAC round trip, response removal.

"""

import numpy as np
import pytest

from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime, read
from quakemigrate_tpu.seis.response import simulate_seismometer
from quakemigrate_tpu.util import MergeError, merge_stream, wa_response


class TestUTCDateTime:
    def test_str_and_uid(self):
        t = UTCDateTime("2014-06-29T18:42:08.376")
        assert str(t) == "2014-06-29T18:42:08.376000Z"
        uid = str(t)
        for c in ["-", ":", ".", " ", "Z", "T"]:
            uid = uid.replace(c, "")
        assert uid[:17].ljust(17, "0") == "20140629184208376"

    def test_julday_parsing(self):
        assert UTCDateTime("2021-049").julday == 49
        assert UTCDateTime(year=2021, julday=49).month == 2

    def test_arithmetic(self):
        t = UTCDateTime("2014-12-31T23:59:59.996")
        t2 = t + 0.004
        assert str(t2) == "2015-01-01T00:00:00.000000Z"
        assert t2 - t == pytest.approx(0.004)

    def test_on_sample_arithmetic_is_exact(self):
        t = UTCDateTime("2021-02-18T12:00:00")
        # 10000 increments of 0.004 s must land exactly on-sample
        t2 = t
        for _ in range(100):
            t2 = t2 + 0.004
        assert (t2 - t) == pytest.approx(0.4)
        assert t2.nanosecond % 4_000_000 == 0


class TestMSEED:
    def test_steim2_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        data = np.round(rng.normal(0, 3e4, 50000)).astype(np.int32)
        tr = Trace(
            data,
            {
                "network": "NW", "station": "COA",
                "starttime": UTCDateTime("2014-06-29T18:00:00"),
                "sampling_rate": 250.0,
            },
        )
        file = tmp_path / "t.mseed"
        Stream([tr]).write(str(file), format="MSEED", encoding="STEIM2")
        st = read(str(file))
        assert np.array_equal(st[0].data, data)
        assert st[0].stats.starttime == tr.stats.starttime
        assert st[0].stats.sampling_rate == 250.0

    def test_steim2_overflow_falls_back(self, tmp_path):
        data = np.array([0, 2**30, -(2**30), 5] * 100, dtype=np.int32)
        tr = Trace(data, {"station": "T", "sampling_rate": 100.0})
        file = tmp_path / "big.mseed"
        Stream([tr]).write(str(file), format="MSEED", encoding="STEIM2")
        st = read(str(file))
        assert np.array_equal(st[0].data, data)

    def test_float_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        data = rng.normal(size=5000)
        tr = Trace(
            data,
            {"station": "SYN", "channel": "CHZ",
             "starttime": UTCDateTime("2021-02-18T12:00:00"),
             "sampling_rate": 100.0},
        )
        file = tmp_path / "f.mseed"
        tr.write(str(file))
        st = read(str(file))
        np.testing.assert_allclose(st[0].data, data)

    def test_windowed_read(self, tmp_path):
        data = np.arange(30000, dtype=np.int32)
        tr = Trace(
            data,
            {"station": "W", "starttime": UTCDateTime(0),
             "sampling_rate": 100.0},
        )
        file = tmp_path / "w.mseed"
        tr.write(str(file))
        st = read(str(file), starttime=UTCDateTime(100), endtime=UTCDateTime(200))
        assert st[0].stats.starttime == UTCDateTime(100)
        assert st[0].stats.npts == 100 * 100 + 1
        assert st[0].data[0] == 10000


class TestMerge:
    def _tr(self, data, start, station="A"):
        return Trace(
            np.asarray(data),
            {"station": station, "channel": "HHZ",
             "starttime": UTCDateTime(start), "sampling_rate": 100.0},
        )

    def test_contiguous(self):
        a = self._tr(np.arange(500), 0.0)
        b = self._tr(np.arange(500, 1000), 5.0)
        merged = Stream([a, b]).merge(method=-1)
        assert len(merged) == 1 and merged[0].stats.npts == 1000

    def test_conflicting_overlap_raises(self):
        a = self._tr(np.arange(500), 0.0)
        c = self._tr(np.arange(200) + 999, 4.0)
        with pytest.raises(MergeError):
            Stream([a, c]).merge(method=-1)

    def test_merge_stream_drops_conflicts(self):
        a = self._tr(np.arange(500), 0.0)
        c = self._tr(np.arange(200) + 999, 4.0)
        good = self._tr(np.arange(100), 0.0, station="B")
        merged = merge_stream(Stream([a, c, good]))
        assert {tr.stats.station for tr in merged} == {"B"}

    def test_mismatched_dtypes_raise(self):
        a = self._tr(np.arange(500, dtype=np.int32), 0.0)
        b = self._tr(np.arange(500, 1000, dtype=np.float64), 5.0)
        with pytest.raises(MergeError):
            Stream([a, b]).merge(method=-1)


class TestSAC:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.normal(size=1000).astype(np.float32)
        tr = Trace(
            data,
            {"station": "SX", "channel": "HHZ", "network": "NW",
             "starttime": UTCDateTime("2020-01-02T03:04:05.5"),
             "sampling_rate": 50.0},
        )
        file = tmp_path / "t.sac"
        tr.write(str(file), format="SAC")
        st = read(str(file))
        np.testing.assert_allclose(st[0].data, data, rtol=1e-6)
        assert st[0].stats.station == "SX"
        assert abs(st[0].stats.starttime - tr.stats.starttime) < 1e-3


class TestResponse:
    def test_wa_simulation_scales_sensitivity(self):
        rng = np.random.default_rng(5)
        sr = 100.0
        t = np.arange(2000) / sr
        data = np.sin(2 * np.pi * 5.0 * t)
        wa = wa_response()
        out = simulate_seismometer(data, sr, paz_simulate=wa, taper=False)
        # At 5 Hz the WA displacement response is close to flat at the
        # sensitivity (2080); check within a factor ~2 mid-trace
        mid = slice(500, 1500)
        ratio = np.abs(out[mid]).max() / np.abs(data[mid]).max()
        assert 1000 < ratio < 4000

    def test_remove_then_apply_is_identity(self):
        rng = np.random.default_rng(6)
        sr = 100.0
        # Band-limited signal (deconvolution cannot recover bands where the
        # response is ~0, e.g. DC)
        t = np.arange(4096) / sr
        data = sum(
            np.sin(2 * np.pi * f * t + p)
            for f, p in zip((2.0, 5.0, 11.0), rng.uniform(0, 6, 3))
        )
        paz = {
            "poles": [-6.28 - 4.71j, -6.28 + 4.71j],
            "zeros": [0j, 0j],
            "sensitivity": 1500.0,
            "gain": 1.0,
        }
        applied = simulate_seismometer(data, sr, paz_simulate=paz, taper=False)
        recovered = simulate_seismometer(
            applied, sr, paz_remove=paz, water_level=60.0, taper=False
        )
        # mid-band recovery (edges affected by the deconvolution)
        mid = slice(1000, 3000)
        corr = np.corrcoef(recovered[mid], data[mid])[0, 1]
        assert corr > 0.99


class TestMSEEDForeignRecords:
    """Records we don't write ourselves: little-endian headers, INT16."""

    @staticmethod
    def _record(endian, encoding, data, sr=100):
        import struct

        header = bytearray(64)
        header[0:6] = b"000001"
        header[6:8] = b"D "
        header[8:13] = b"FOR  "
        header[13:15] = b"  "
        header[15:18] = b"HHZ"
        header[18:20] = b"XX"
        struct.pack_into(endian + "HHBBBBH", header, 20, 2020, 100, 1, 2, 3,
                         0, 0)
        struct.pack_into(endian + "Hhh", header, 30, len(data), sr, 1)
        struct.pack_into("BBBB", header, 36, 0, 0, 0, 1)
        struct.pack_into(endian + "i", header, 40, 0)
        struct.pack_into(endian + "HH", header, 44, 64, 48)
        struct.pack_into(endian + "HH", header, 48, 1000, 0)
        struct.pack_into("BBBB", header, 52, encoding, 1 if endian == ">" else 0,
                         9, 0)
        dtype = {1: "i2", 3: "i4", 4: "f4"}[encoding]
        payload = np.asarray(data, dtype=endian + dtype).tobytes()
        return bytes(header) + payload.ljust(512 - 64, b"\x00")

    @pytest.mark.parametrize("endian", [">", "<"])
    @pytest.mark.parametrize("encoding", [1, 3, 4])
    def test_read_foreign(self, tmp_path, endian, encoding):
        data = np.arange(-50, 50)
        file = tmp_path / "foreign.mseed"
        file.write_bytes(self._record(endian, encoding, data))
        st = read(str(file))
        assert len(st) == 1
        tr = st[0]
        assert tr.stats.station == "FOR"
        assert tr.stats.sampling_rate == 100
        assert tr.stats.starttime.julday == 100
        np.testing.assert_array_equal(tr.data, data)


def test_gse2_roundtrip(tmp_path):
    """GSE2/CM6 write -> read roundtrip, incl. multi-char + negative values."""

    from quakemigrate_tpu.seis import Stream, Trace, read

    rng = np.random.default_rng(5)
    data = np.concatenate([
        rng.integers(-10, 10, 100),           # 1-char values
        rng.integers(-100000, 100000, 200),   # multi-char values
        np.array([0, 2**25, -(2**25), 1]),    # extremes
    ]).astype(np.int32)
    tr = Trace(data, {"station": "GSET", "channel": "HHZ",
                      "sampling_rate": 50.0,
                      "starttime": "2021-02-18T01:02:03.456"})
    f = tmp_path / "test.gse2"
    Stream([tr]).write(str(f), format="GSE2")

    st = read(str(f))  # format auto-detected from WID2
    assert len(st) == 1
    out = st[0]
    assert out.stats.station == "GSET"
    assert out.stats.channel == "HHZ"
    assert out.stats.sampling_rate == 50.0
    assert abs(out.stats.starttime - tr.stats.starttime) < 1e-3
    np.testing.assert_array_equal(out.data, data)


def test_gse2_rejects_floats(tmp_path):
    from quakemigrate_tpu.seis import Stream, Trace

    tr = Trace(np.array([0.5, 1.2]), {"station": "X",
                                      "sampling_rate": 50.0})
    with np.testing.assert_raises(ValueError):
        Stream([tr]).write(str(tmp_path / "f.gse2"), format="GSE2")


def test_gse2_checksum_detects_corruption(tmp_path):
    from quakemigrate_tpu.seis import Stream, Trace, read

    tr = Trace(np.arange(100, dtype=np.int32),
               {"station": "X", "sampling_rate": 50.0})
    f = tmp_path / "c.gse2"
    Stream([tr]).write(str(f), format="GSE2")
    text = f.read_text()
    lines = text.splitlines()
    # corrupt one data character
    for i, ln in enumerate(lines):
        if ln == "DAT2":
            lines[i + 1] = ("9" if lines[i + 1][0] != "9" else "8") + lines[i + 1][1:]
            break
    f.write_text("\n".join(lines))
    with np.testing.assert_raises(ValueError):
        read(str(f))


def test_segy_roundtrip(tmp_path):
    from quakemigrate_tpu.seis import Stream, Trace, read

    rng = np.random.default_rng(6)
    traces = [
        Trace(rng.normal(size=500).astype(np.float32),
              {"station": f"S{i}", "channel": "HHZ",
               "sampling_rate": 100.0,
               "starttime": "2021-02-18T01:02:03.0"})
        for i in range(3)
    ]
    f = tmp_path / "test.segy"
    Stream(traces).write(str(f), format="SEGY")

    st = read(str(f))  # auto-detected from the textual header
    assert len(st) == 3
    for orig, out in zip(traces, st):
        assert out.stats.sampling_rate == 100.0
        assert abs(out.stats.starttime - orig.stats.starttime) < 1.0
        np.testing.assert_array_equal(out.data, orig.data)


def test_segy_rejects_oversize(tmp_path):
    from quakemigrate_tpu.seis import Stream, Trace

    tr = Trace(np.zeros(70000, dtype=np.float32),
               {"station": "X", "sampling_rate": 100.0})
    with np.testing.assert_raises(ValueError):
        Stream([tr]).write(str(tmp_path / "f.segy"), format="SEGY")


class TestSteimFuzz:
    """Randomised round-trip fuzz of the C STEIM codecs across the difference
    regimes each frame-nibble encoding covers (the codecs carry every golden
    parity test, so exactness must hold for arbitrary int32 content)."""

    def test_steim_roundtrip_fuzz(self, tmp_path):
        rng = np.random.default_rng(2024)
        regimes = [
            3,           # 2x 4-bit diffs territory
            100,         # 1-byte diffs
            20_000,      # 2-byte diffs
            5_000_000,   # 30-bit diffs (STEIM2) / 4-byte (STEIM1)
        ]
        for encoding in ("STEIM1", "STEIM2"):
            for case, scale in enumerate(regimes):
                n = int(rng.integers(1, 4000))
                data = np.cumsum(
                    rng.integers(-scale, scale + 1, n)
                ).astype(np.int32)
                tr = Trace(
                    data,
                    {"station": f"F{case}", "sampling_rate": 100.0,
                     "starttime": UTCDateTime("2020-01-01")},
                )
                file = tmp_path / f"{encoding}_{case}.mseed"
                Stream([tr]).write(str(file), format="MSEED",
                                   encoding=encoding)
                back = read(str(file))[0]
                assert np.array_equal(back.data, data), (encoding, case, n)

    def test_steim_mixed_regimes_single_trace(self, tmp_path):
        """Abrupt regime switches (quiet -> spike -> quiet) within a trace."""

        rng = np.random.default_rng(7)
        quiet = rng.integers(-5, 6, 3000)
        spikes = rng.integers(-(2**28), 2**28, 50)
        data = np.concatenate(
            [quiet[:1000], spikes, quiet[1000:2000], -spikes, quiet[2000:]]
        ).astype(np.int32)
        file = tmp_path / "mixed.mseed"
        Stream([Trace(data, {"station": "MX", "sampling_rate": 50.0})]).write(
            str(file), format="MSEED", encoding="STEIM2"
        )
        assert np.array_equal(read(str(file))[0].data, data)

    def test_steim_extreme_values(self, tmp_path):
        """INT32_MIN/MAX first differences survive (forces the fallback)."""

        data = np.array(
            [0, np.iinfo(np.int32).max, np.iinfo(np.int32).min // 2,
             -1, 1, 0] * 20,
            dtype=np.int32,
        )
        file = tmp_path / "extreme.mseed"
        Stream([Trace(data, {"station": "EX", "sampling_rate": 1.0})]).write(
            str(file), format="MSEED", encoding="STEIM2"
        )
        assert np.array_equal(read(str(file))[0].data, data)


def test_segy_low_sampling_rate(tmp_path):
    """20 Hz => 50000 us sample interval, which overflows a signed short:
    the binary file header must pack it unsigned (regression)."""

    from quakemigrate_tpu.seis import Stream, Trace, read

    tr = Trace(
        np.arange(100, dtype=np.float32),
        {"station": "LOW", "channel": "HHZ", "sampling_rate": 20.0,
         "starttime": "2021-02-18T01:02:03.0"},
    )
    f = tmp_path / "low.segy"
    Stream([tr]).write(str(f), format="SEGY")
    st = read(str(f))
    assert st[0].stats.sampling_rate == 20.0
    np.testing.assert_array_equal(st[0].data, tr.data)


def test_sac_char_header_layout(tmp_path):
    """ka/kt0-kt3 live in distinct 8-byte slots at the canonical SAC
    offsets (ka=40, kt0=48..kt3=72 within the char block): a P label in
    'ka' and an S label in 'kt0' must not collide (regression)."""

    from quakemigrate_tpu.seis import Stream, Trace
    from quakemigrate_tpu.seis.sac import read_sac

    tr = Trace(
        np.arange(50, dtype=np.float32),
        {"station": "STA1", "channel": "HHZ", "network": "XX",
         "starttime": "2021-01-01T00:00:00", "sampling_rate": 100.0},
    )
    f = tmp_path / "t.sac"
    Stream([tr]).write(
        str(f), format="SAC", extra_headers={"a": 1.5, "ka": "P",
                                             "t0": 3.0, "kt0": "S"}
    )

    raw = f.read_bytes()
    chars = raw[632 - 192 : 632]  # char block: last 192 bytes of header
    assert chars[40:48].decode().strip() == "P"   # ka
    assert chars[48:56].decode().strip() == "S"   # kt0

    st = read_sac(str(f))
    assert st[0].stats.station == "STA1"


def test_utcdatetime_tz_aware_offset():
    """A tz-aware datetime with a non-UTC offset converts to UTC
    (regression: the offset was ignored)."""

    from datetime import datetime, timedelta, timezone

    dt = datetime(2020, 6, 1, 12, 0, 0, tzinfo=timezone(timedelta(hours=2)))
    t = UTCDateTime(dt)
    assert str(t).startswith("2020-06-01T10:00:00")

    # Offsets that cross a date boundary
    dt2 = datetime(2020, 6, 1, 1, 30, 0,
                   tzinfo=timezone(timedelta(hours=5, minutes=30)))
    assert str(UTCDateTime(dt2)).startswith("2020-05-31T20:00:00")


def test_merge_method0_conflict_raises():
    """merge(method=0) without fill_value must raise on conflicting
    overlaps, as documented (regression: it silently overwrote)."""

    from quakemigrate_tpu.util import MergeError

    hdr = {"station": "S", "channel": "HHZ", "sampling_rate": 10.0}
    a = Trace(np.zeros(20), {**hdr, "starttime": "2021-01-01T00:00:00"})
    b = Trace(np.ones(20), {**hdr, "starttime": "2021-01-01T00:00:01"})
    with pytest.raises(MergeError):
        Stream([a, b]).merge(method=0)

    # With a fill_value the later trace wins, no error
    st = Stream([a.copy(), b.copy()]).merge(method=0, fill_value=0)
    assert len(st) == 1


def test_gse2_subsecond_rollover(tmp_path):
    """A starttime whose milliseconds round up past 59.999 s must not
    emit an unparseable '60.000' seconds field (regression)."""

    from quakemigrate_tpu.seis import read

    tr = Trace(
        np.arange(40, dtype=np.int32),
        {"station": "ROLL", "channel": "HHZ", "sampling_rate": 20.0,
         "starttime": UTCDateTime("2021-01-01T00:00:59.999600")},
    )
    f = tmp_path / "roll.gse2"
    Stream([tr]).write(str(f), format="GSE2")
    st = read(str(f))
    assert abs(st[0].stats.starttime - UTCDateTime("2021-01-01T00:01:00")) \
        < 1e-6


def test_response_epoch_mismatch_raises():
    """A query time outside every response epoch errors instead of
    silently returning the first epoch (regression)."""

    from quakemigrate_tpu.seis.response import Inventory
    from quakemigrate_tpu.util import ResponseNotFoundError

    class _Resp:
        start = UTCDateTime("2010-01-01")
        end = UTCDateTime("2015-01-01")

    inv = Inventory(responses={"XX.STA1..HHZ": [_Resp()]})
    assert inv.get_response("XX.STA1..HHZ", UTCDateTime("2012-06-01")) \
        is not None
    assert inv.get_response("XX.STA1..HHZ") is not None  # no-time query
    with pytest.raises(ResponseNotFoundError):
        inv.get_response("XX.STA1..HHZ", UTCDateTime("2017-06-01"))


def test_steim_python_fallback_matches_native_on_extremes():
    """
    The pure-Python STEIM fallback must reproduce the native codec's
    int32-wraparound semantics on INT32-extreme samples (regression: the
    Python decode overflowed / the encode misclassified wrapped diffs).

    """

    from quakemigrate_tpu.core import _lib, steim_decode, steim_encode, steim_py

    if _lib is None:
        pytest.skip("native library unavailable; nothing to cross-check")

    # Consecutive samples hop between the INT32 extremes so that every
    # difference wraps into a SMALL int32 value (e.g. INT32_MIN -
    # INT32_MAX -> +1): the codecs must agree on wraparound, and STEIM2
    # must not misclassify the unwrapped int64 diff as >30 bits.
    samples = np.array(
        [2147483647, -2147483648, -2147483647, 2147483647, 2147483645,
         -2147483648, -2147483640],
        dtype=np.int32,
    )

    for encoding in (10, 11):
        # Native encode -> Python decode must round-trip
        n, frames = steim_encode(samples, int(samples[0]), 8, encoding)
        assert n == len(samples)
        out_py = np.empty(len(samples), dtype=np.int32)
        got = steim_py.decode(
            np.frombuffer(frames, dtype=np.uint8), len(frames) // 64,
            len(samples), out_py, encoding,
        )
        assert got == len(samples)
        np.testing.assert_array_equal(out_py, samples)

        # Python encode (wraparound diffs) -> native decode must round-trip
        out_pyenc = np.zeros(64 * 8, dtype=np.uint8)
        n2, frames_used = steim_py.encode(
            samples, int(samples[0]), out_pyenc, 8, encoding
        )
        assert n2 == len(samples)
        out_rt = steim_decode(
            out_pyenc[: frames_used * 64].tobytes(), len(samples), encoding
        )
        np.testing.assert_array_equal(out_rt, samples)


def test_read_mseed_window_boundary_in_record_seam(tmp_path):
    """
    Off-sample archives: a read window starting inside an inter-record
    seam must still include the record whose LAST sample is nearest the
    window start (nearest_sample semantics; regression: the record was
    skipped, dropping a sample and sporadically failing availability).

    """

    from quakemigrate_tpu.seis import read

    sr = 125.0
    # Two traces around a sub-sample seam: tr1's last sample at 9.996,
    # tr2 starts at 10.004
    t1 = UTCDateTime("2021-01-01T00:00:00.004000")
    tr1 = Trace(
        np.arange(1250, dtype=np.int32),
        {"station": "SEAM", "channel": "HHZ", "sampling_rate": sr,
         "starttime": t1},
    )
    t2 = UTCDateTime("2021-01-01T00:00:10.008000")
    tr2 = Trace(
        np.arange(1250, dtype=np.int32),
        {"station": "SEAM", "channel": "HHZ", "sampling_rate": sr,
         "starttime": t2},
    )
    f = tmp_path / "seam.m"
    Stream([tr1, tr2]).write(str(f), format="MSEED")

    # Window starts at 9.998 -- within half a sample period after tr1's
    # last sample (9.996), which is therefore the nearest sample and
    # must be included.
    w0 = UTCDateTime("2021-01-01T00:00:09.998")
    w1 = UTCDateTime("2021-01-01T00:00:15.0")
    st = read(str(f), starttime=w0, endtime=w1)
    starts = sorted(tr.stats.starttime for tr in st)
    assert len(st) == 2, [str(tr) for tr in st]
    assert abs(starts[0] - UTCDateTime("2021-01-01T00:00:09.996")) < 1e-6

    # Same result through the cached record index (second read)
    st2 = read(str(f), starttime=w0, endtime=w1)
    assert len(st2) == 2


def test_trim_window_fully_outside_trace():
    """A trim window lying entirely before (or after) the trace yields an
    empty trace -- or all-fill with pad=True -- never a negative-end
    slice keeping out-of-window data (regression)."""

    tr = Trace(
        np.arange(100, dtype=np.float64),
        {"station": "TW", "sampling_rate": 1.0,
         "starttime": UTCDateTime(100.0)},
    )

    before = tr.copy().trim(starttime=UTCDateTime(80), endtime=UTCDateTime(90))
    assert before.stats.npts == 0

    after = tr.copy().trim(
        starttime=UTCDateTime(300), endtime=UTCDateTime(310)
    )
    assert after.stats.npts == 0

    padded = tr.copy().trim(
        starttime=UTCDateTime(80), endtime=UTCDateTime(90), pad=True,
        fill_value=0,
    )
    assert padded.stats.npts == 11
    assert (padded.data == 0).all()
    assert padded.stats.starttime == UTCDateTime(80)


def test_rotate_requires_aligned_components():
    """Rotating misaligned components raises instead of silently
    combining samples from different times (regression)."""

    hdr = {"station": "MA", "sampling_rate": 100.0}
    n = Trace(np.ones(500), {**hdr, "channel": "HHN",
                             "starttime": UTCDateTime(0)})
    e = Trace(np.ones(500), {**hdr, "channel": "HHE",
                             "starttime": UTCDateTime(3.0)})
    with pytest.raises(ValueError, match="share"):
        Stream([n, e]).rotate("NE->RT", back_azimuth=30.0)


def test_stats_template_not_shared_between_traces():
    """Building two traces from one Stats template must not share the
    header (regression: npts/endtime corrupted through aliasing)."""

    from quakemigrate_tpu.seis.trace import Stats

    template = Stats({"station": "TP", "sampling_rate": 100.0,
                      "starttime": UTCDateTime(0)})
    a = Trace(np.ones(100), template)
    b = Trace(np.ones(25), template)
    assert a.stats.npts == 100
    assert b.stats.npts == 25
    assert a.stats.endtime != b.stats.endtime


def test_merge_no_fill_value_keeps_gap_split():
    """merge(method=1) without a fill_value must not fabricate zero
    samples across gaps (regression)."""

    hdr = {"station": "GP", "channel": "HHZ", "sampling_rate": 10.0}
    a = Trace(np.ones(10), {**hdr, "starttime": UTCDateTime(0)})
    b = Trace(np.ones(10), {**hdr, "starttime": UTCDateTime(2.0)})
    st = Stream([a, b]).merge(method=1)
    assert len(st) == 2  # gap NOT filled
    st2 = Stream([a.copy(), b.copy()]).merge(method=1, fill_value=7.0)
    assert len(st2) == 1
    assert (st2[0].data[10:20] == 7.0).all()


def test_lanczos_vectorised_matches_loop():
    """The vectorised interior path of the Lanczos interpolator matches
    the per-sample formula everywhere (including edges)."""

    from quakemigrate_tpu.seis.trace import _lanczos_interpolate

    rng = np.random.default_rng(8)
    data = rng.normal(size=200)
    positions = np.sort(rng.uniform(-0.4, 199.4, size=300))
    a = 20

    got = _lanczos_interpolate(data, positions, a)

    expected = np.empty(positions.size)
    for j, pos in enumerate(positions):
        f0 = int(np.floor(pos))
        i0, i1 = max(0, f0 - a + 1), min(data.size, f0 + a + 1)
        idx = np.arange(i0, i1)
        x = pos - idx
        kernel = np.sinc(x) * np.sinc(x / a)
        expected[j] = np.dot(data[idx], kernel) / np.sum(kernel)

    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_upsample_to_exact_target_still_conditions(tmp_path):
    """25 Hz -> 50 Hz with upfactor=2 (upsampled rate == target) must
    still run the decimate-stage conditioning (detrend/taper/lowpass),
    as the reference always does after upsampling (regression)."""

    from quakemigrate_tpu.util import resample as qm_resample

    sr = 25.0
    n = 2500
    t = np.arange(n) / sr
    # Strong linear trend: surviving the pipeline means detrend ran
    data = 1000.0 + 5.0 * t + np.sin(2 * np.pi * 3.0 * t)
    tr = Trace(
        data,
        {"station": "UP", "channel": "HHZ", "sampling_rate": sr,
         "starttime": UTCDateTime(0)},
    )
    out = qm_resample(
        Stream([tr]), 50.0, True, 2, UTCDateTime(0), UTCDateTime(99.0)
    )
    assert out[0].stats.sampling_rate == 50.0
    # Detrended: mean far below the raw mean (~1250)
    assert abs(np.mean(out[0].data)) < 10.0


def test_read_little_endian_steim(tmp_path):
    """STEIM payloads with Blockette-1000 word order 0 (little-endian --
    non-standard but common) decode correctly (regression: always
    decoded big-endian, yielding garbage or dropped records)."""

    import struct

    from quakemigrate_tpu.core import steim_encode

    rng = np.random.default_rng(3)
    data = np.round(np.cumsum(rng.normal(0, 100, 300))).astype(np.int32)
    n, frames = steim_encode(data, int(data[0]), 7, 11)
    assert n == len(data)
    # Byte-swap each 32-bit word to little-endian
    le_payload = np.frombuffer(frames, dtype=">u4").astype("<u4").tobytes()

    endian = "<"
    header = bytearray(64)
    header[0:6] = b"000001"
    header[6:8] = b"D "
    header[8:13] = b"LES  "
    header[15:18] = b"HHZ"
    header[18:20] = b"XX"
    struct.pack_into(endian + "HHBBBBH", header, 20, 2020, 100, 1, 2, 3,
                     0, 0)
    struct.pack_into(endian + "Hhh", header, 30, len(data), 100, 1)
    struct.pack_into("BBBB", header, 36, 0, 0, 0, 1)
    struct.pack_into(endian + "i", header, 40, 0)
    struct.pack_into(endian + "HH", header, 44, 64, 48)
    struct.pack_into(endian + "HH", header, 48, 1000, 0)
    struct.pack_into("BBBB", header, 52, 11, 0, 9, 0)  # word_order = 0

    file = tmp_path / "le_steim.mseed"
    file.write_bytes(
        bytes(header) + le_payload.ljust(512 - 64, b"\x00")
    )
    st = read(str(file))
    assert len(st) == 1
    np.testing.assert_array_equal(st[0].data, data)


def test_write_mseed_rejects_tiny_reclen_and_overflow(tmp_path):
    """reclen=64 (no data capacity) and out-of-range INT16 data raise
    instead of heap-corrupting / silently wrapping (regression)."""

    tr = Trace(
        np.arange(100, dtype=np.int32),
        {"station": "RJ", "sampling_rate": 100.0,
         "starttime": UTCDateTime(0)},
    )
    with pytest.raises(ValueError, match="at least 128"):
        Stream([tr]).write(str(tmp_path / "a.m"), format="MSEED", reclen=64)

    big = Trace(
        np.array([0, 40000, -40000], dtype=np.int32),
        {"station": "RJ", "sampling_rate": 100.0,
         "starttime": UTCDateTime(0)},
    )
    from quakemigrate_tpu.seis.mseed import MSEEDError

    with pytest.raises(MSEEDError, match="overflows"):
        Stream([big]).write(str(tmp_path / "b.m"), format="MSEED",
                            encoding="INT16")


def test_indexed_windowed_read_spans(tmp_path):
    """The indexed (second) read of a time window must equal the
    unindexed (first) read at every window position -- including windows
    at the file edges, spanning record boundaries, and fully outside the
    data. The indexed path reads only the needed byte span of the file
    (day-long archive files made whole-file re-reads the detect
    bottleneck), so record selection and offset rebasing must agree
    exactly with the full walk."""

    from quakemigrate_tpu.seis.mseed import _INDEX_CACHE

    rng = np.random.default_rng(5)
    sr = 100.0
    t0 = UTCDateTime("2021-03-01T00:00:00.0")
    # Multi-record file: ~40 STEIM2 records of varying compressibility
    data = np.cumsum(rng.integers(-1000, 1000, 20_000)).astype(np.int32)
    f = tmp_path / "span.m"
    Trace(
        data, {"station": "SP", "channel": "BHZ", "sampling_rate": sr,
               "starttime": t0},
    ).write(str(f), format="MSEED")

    windows = [
        (t0 + 10, t0 + 30),           # interior
        (t0 - 5, t0 + 1),             # overlapping the start
        (t0 + 195, t0 + 250),         # overlapping the end
        (t0 - 10, t0 - 1),            # fully before
        (t0 + 500, t0 + 600),         # fully after
        (t0, t0 + 199.99),            # whole span
        (t0 + 50.005, t0 + 50.015),   # sub-record window
    ]
    for w0, w1 in windows:
        _INDEX_CACHE.clear()
        fresh = read(str(f), starttime=w0, endtime=w1)     # builds index
        indexed = read(str(f), starttime=w0, endtime=w1)   # uses index
        assert len(fresh) == len(indexed), (str(w0), str(w1))
        for a, b in zip(fresh, indexed):
            assert a.stats.starttime == b.stats.starttime
            assert a.stats.npts == b.stats.npts
            np.testing.assert_array_equal(a.data, b.data)


def test_uniform_fast_walk_matches_general(tmp_path):
    """The vectorised uniform-file walk + native batch decode must equal
    the general per-record walk on every window, for contiguous, gappy,
    and STEIM1-fallback files -- and must decline files that violate
    uniformity (multiplexed channels) so the general walk handles them."""

    import quakemigrate_tpu.seis.mseed as M
    from quakemigrate_tpu.seis.mseed import _INDEX_CACHE, _try_uniform_walk

    rng = np.random.default_rng(11)
    t0 = UTCDateTime("2020-06-01T00:00:00")

    def both(path, w0, w1):
        _INDEX_CACHE.clear()
        fast = read(str(path), starttime=w0, endtime=w1)
        _INDEX_CACHE.clear()
        orig = M._try_uniform_walk
        M._try_uniform_walk = lambda buf: None
        try:
            slow = read(str(path), starttime=w0, endtime=w1)
        finally:
            M._try_uniform_walk = orig
        assert len(fast) == len(slow)
        for a, b in zip(fast, slow):
            assert a.stats.starttime == b.stats.starttime
            assert a.stats.sampling_rate == b.stats.sampling_rate
            np.testing.assert_array_equal(a.data, b.data)
        return fast

    # Gappy single-channel file, incl. a huge-difference segment that
    # forces per-record STEIM1 fallback inside the STEIM2 file.
    smooth = np.cumsum(rng.integers(-300, 300, 6000)).astype(np.int32)
    wild = (rng.integers(-2, 2, 3000) * 1_500_000_000).astype(np.int32)
    f = tmp_path / "mix.m"
    Stream([
        Trace(smooth, {"station": "FW", "channel": "BHZ",
                       "sampling_rate": 100.0, "starttime": t0}),
        Trace(wild, {"station": "FW", "channel": "BHZ",
                     "sampling_rate": 100.0, "starttime": t0 + 90}),
    ]).write(str(f), format="MSEED")
    # The fast path must actually engage for this file
    assert _try_uniform_walk(f.read_bytes()) is not None
    for w in [(None, None), (t0 + 10, t0 + 20), (t0 + 50, t0 + 100),
              (t0 + 95, t0 + 100), (t0 - 10, t0 - 1)]:
        both(f, *w)

    # Multiplexed (two channels, e.g. the 5-channel scanmseed day
    # files): handled by the fast path via per-id grouping.
    g = tmp_path / "multi.m"
    Stream([
        Trace(smooth[:2000], {"station": "FW", "channel": "BHZ",
                              "sampling_rate": 100.0, "starttime": t0}),
        Trace(smooth[:2000], {"station": "FW", "channel": "BHN",
                              "sampling_rate": 100.0, "starttime": t0}),
    ]).write(str(g), format="MSEED")
    assert _try_uniform_walk(g.read_bytes()) is not None
    st = both(g, None, None)
    assert len(st) == 2
    both(g, t0 + 2, t0 + 9)

    # Mixed sampling rates DO violate uniformity: declined to the
    # general walk.
    h = tmp_path / "rates.m"
    Stream([
        Trace(smooth[:2000], {"station": "FW", "channel": "BHZ",
                              "sampling_rate": 100.0, "starttime": t0}),
        Trace(smooth[:2000], {"station": "FW", "channel": "BHZ",
                              "sampling_rate": 50.0, "starttime": t0 + 30}),
    ]).write(str(h), format="MSEED")
    assert _try_uniform_walk(h.read_bytes()) is None
    _INDEX_CACHE.clear()
    assert len(read(str(h))) == 2


def test_uniform_fast_walk_declines_npts_overflow(tmp_path):
    """A non-STEIM record claiming more samples than its payload holds
    must NOT be decoded by the uniform fast path (its segment edges
    assume the claimed npts, misattributing later samples -- review
    finding); it declines to the general walk, which logs and handles
    the short record."""

    import quakemigrate_tpu.seis.mseed as M
    from quakemigrate_tpu.seis.mseed import _INDEX_CACHE, _try_uniform_walk

    t0 = UTCDateTime("2020-06-01T00:00:00")
    mk = lambda start: Trace(
        np.arange(224, dtype=np.int32),
        {"station": "NP", "channel": "BHZ", "sampling_rate": 1.0,
         "starttime": start},
    )
    f = tmp_path / "npts.m"
    Stream([mk(t0), mk(t0 + 300)]).write(
        str(f), format="MSEED", encoding="INT32"
    )
    blob = bytearray(f.read_bytes())
    # Record 1's npts field (offset 30 within the record) -> 400, far
    # beyond the 112-sample INT32 payload capacity of a 512 B record.
    blob[512 + 30 : 512 + 32] = int(400).to_bytes(2, "big")
    f.write_bytes(bytes(blob))

    assert _try_uniform_walk(bytes(blob)) is not None  # layout IS uniform
    _INDEX_CACHE.clear()
    fast = read(str(f))
    _INDEX_CACHE.clear()
    orig = M._try_uniform_walk
    M._try_uniform_walk = lambda buf: None
    try:
        general = read(str(f))
    finally:
        M._try_uniform_walk = orig
    assert len(fast) == len(general)
    for a, b in zip(fast, general):
        assert a.stats.starttime == b.stats.starttime
        np.testing.assert_array_equal(a.data, b.data)


def test_mseed_high_sampling_rate_roundtrip(tmp_path):
    """Rates beyond the signed-short header field encode as a
    factor x multiplier pair (e.g. 40 kHz = 200 * 200) instead of
    crashing struct.pack (review finding)."""

    from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime, read

    tr = Trace(
        np.arange(2000, dtype=np.int32),
        {"station": "HSR", "network": "XX", "channel": "GPZ",
         "sampling_rate": 40000.0,
         "starttime": UTCDateTime("2020-01-01T00:00:00")},
    )
    path = tmp_path / "hsr.m"
    Stream([tr]).write(str(path), format="MSEED")
    back = read(str(path))[0]
    assert back.stats.sampling_rate == 40000.0
    np.testing.assert_array_equal(back.data, tr.data)


def test_mseed_write_rejects_unknown_encoding_and_zero_rate(tmp_path):
    from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime
    from quakemigrate_tpu.seis.mseed import MSEEDError, write_mseed

    tr = Trace(
        np.arange(10, dtype=np.int32),
        {"station": "BAD", "network": "XX", "channel": "HHZ",
         "sampling_rate": 50.0,
         "starttime": UTCDateTime("2020-01-01T00:00:00")},
    )
    with pytest.raises(MSEEDError, match="encoding"):
        write_mseed(Stream([tr]), str(tmp_path / "a.m"), encoding=2)
    with pytest.raises(MSEEDError, match="encoding"):
        write_mseed(Stream([tr]), str(tmp_path / "b.m"), encoding="INT24")
    tr.stats.sampling_rate = 0.0
    with pytest.raises(MSEEDError, match="sampling rate"):
        write_mseed(Stream([tr]), str(tmp_path / "c.m"))


def test_mseed_general_walk_skips_overclaimed_npts(tmp_path):
    """A non-STEIM record whose claimed npts exceeds the payload
    capacity is logged and skipped by the general walk, not silently
    truncated (review finding)."""

    import struct

    from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime, read

    tr = Trace(
        np.arange(100, dtype=np.int32),
        {"station": "CRP", "network": "XX", "channel": "HHZ",
         "sampling_rate": 50.0,
         "starttime": UTCDateTime("2020-01-01T00:00:00")},
    )
    path = tmp_path / "crp.m"
    Stream([tr]).write(str(path), format="MSEED", encoding="INT32")
    raw = bytearray(path.read_bytes())
    # Inflate the first record's sample count past its payload capacity.
    struct.pack_into(">H", raw, 30, 5000)
    path.write_bytes(bytes(raw))

    st = read(str(path))
    # The corrupt record is dropped; any remaining records (here: none,
    # 100 samples fit one record) yield an empty stream rather than a
    # silently truncated trace.
    assert sum(t.stats.npts for t in st) == 0
