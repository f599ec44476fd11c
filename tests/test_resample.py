# -*- coding: utf-8 -*-
"""
Resampling-chain tests: direct decimation, and the upsample-then-decimate
path for archives with mismatched sampling rates (e.g. 40 Hz data scanned
at 50 Hz requires upfactor 5).

"""

import numpy as np
import pytest

import quakemigrate_tpu.util as util
from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime


def _sine_trace(sr, duration, freq=2.0, station="A"):
    t = np.arange(int(sr * duration) + 1) / sr
    return Trace(
        np.sin(2 * np.pi * freq * t),
        {"station": station, "channel": "HHZ",
         "starttime": UTCDateTime("2020-01-01T00:00:00"),
         "sampling_rate": float(sr)},
    )


def test_direct_decimation():
    tr = _sine_trace(100, 60)
    start, end = tr.stats.starttime, tr.stats.endtime
    st = util.resample(Stream([tr]), 50, False, None, start, end)
    out = st[0]
    assert out.stats.sampling_rate == 50
    # Signal preserved mid-trace (edges tapered)
    t = out.times()[500:2500]
    expected = np.sin(2 * np.pi * 2.0 * t)
    np.testing.assert_allclose(out.data[500:2500], expected, atol=0.02)


def test_upsample_then_decimate():
    tr = _sine_trace(40, 60)
    start, end = tr.stats.starttime, tr.stats.endtime
    # 40 Hz -> x5 -> 200 Hz -> /4 -> 50 Hz
    st = util.resample(Stream([tr]), 50, True, 5, start, end)
    out = st[0]
    assert out.stats.sampling_rate == 50
    t = out.times()[500:2500]
    expected = np.sin(2 * np.pi * 2.0 * t)
    np.testing.assert_allclose(out.data[500:2500], expected, atol=0.03)


def test_bad_upfactor_raises():
    tr = _sine_trace(40, 10)
    start, end = tr.stats.starttime, tr.stats.endtime
    with pytest.raises(util.BadUpfactorException):
        util.resample(Stream([tr]), 60, True, 2, start, end)  # 80 % 60 != 0


def test_mismatched_rate_without_resample_drops():
    tr = _sine_trace(40, 10)
    start, end = tr.stats.starttime, tr.stats.endtime
    st = util.resample(Stream([tr]), 50, False, None, start, end)
    # Trace kept at original rate (logged); onset availability check later
    # rejects it
    assert st[0].stats.sampling_rate == 40


def test_shift_to_sample_metadata():
    tr = _sine_trace(100, 10)
    tr.stats.starttime = UTCDateTime("2020-01-01T00:00:00.0034")
    shifted = util.shift_to_sample(Stream([tr]))[0]
    # snapped to the nearest on-sample time (multiple of 0.01 s)
    assert shifted.stats.starttime.microsecond % 10000 == 0


def test_shift_to_sample_interpolate():
    tr = _sine_trace(100, 10)
    tr.stats.starttime = UTCDateTime("2020-01-01T00:00:00.0034")
    shifted = util.shift_to_sample(Stream([tr]), interpolate=True)[0]
    assert shifted.stats.starttime.microsecond % 10000 == 0
    assert shifted.stats.npts == tr.stats.npts
    # Interpolated data should still be the same sine mid-trace
    t_abs = (
        np.arange(shifted.stats.npts) / 100.0
        + (shifted.stats.starttime - tr.stats.starttime)
    )
    expected = np.sin(2 * np.pi * 2.0 * t_abs)
    np.testing.assert_allclose(
        shifted.data[100:900], expected[100:900], atol=0.01
    )
