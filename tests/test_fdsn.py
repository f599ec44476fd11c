# -*- coding: utf-8 -*-
"""
FDSN download tooling (io/fdsn.py) against a mocked HTTP layer: channel
priorities, day-file archive layout, StationXML sidecar, and no-data
handling — the capability the reference's examples get from ObsPy's
mass downloader (reference examples/Icequake_Iceland/
get_iceland_icequake_data.py).

"""

import io
import urllib.parse

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu.io import fdsn
from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime, read
from quakemigrate_tpu.util import ArchiveFDSNException

T0 = UTCDateTime("2014-06-29T18:42:00.0")


def _mseed_bytes(station, channel, starttime, npts=500, sps=50.0):
    tr = Trace(
        data=(np.random.default_rng(1).normal(size=npts) * 100).astype(
            np.int32
        ),
        header=dict(station=station, channel=channel, network="ZK",
                    sampling_rate=sps, starttime=starttime),
    )
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".m") as f:
        Stream([tr]).write(f.name, format="MSEED")
        f.seek(0)
        return f.read()


class _FakeResponse:
    def __init__(self, status, payload=b""):
        self.status = status
        self._payload = payload

    def read(self):
        return self._payload

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture
def fake_service(monkeypatch):
    """Mock urlopen: CH? channels have data for SKR01 only; DL? channels
    for SKR02; station service returns a minimal StationXML."""

    calls = []

    def urlopen(url, timeout=None):
        calls.append(url)
        query = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
        if "/fdsnws/station/1/query" in url:
            xml = (f"<?xml version='1.0'?><FDSNStationXML>"
                   f"<Station code='{query['station']}'/></FDSNStationXML>")
            return _FakeResponse(200, xml.encode())
        assert "/fdsnws/dataselect/1/query" in url
        station, channel = query["station"], query["channel"]
        start = UTCDateTime(query["starttime"])
        have = {"SKR01": "CH", "SKR02": "DL"}[station]
        if not any(ch.startswith(have) for ch in channel.split(",")):
            return _FakeResponse(204)
        return _FakeResponse(
            200, b"".join(
                _mseed_bytes(station, f"{have}{c}", start) for c in "ZNE"
            )
        )

    monkeypatch.setattr(fdsn.urllib.request, "urlopen", urlopen)
    return calls


def test_expand_channel_pattern():
    assert fdsn._expand_channel_pattern("CH[ZNE]") == "CHZ,CHN,CHE"
    assert fdsn._expand_channel_pattern("BH?") == "BH?"
    assert fdsn._expand_channel_pattern("HH[ZN]*") == "HHZ*,HHN*"
    # Multiple bracket groups expand to the full cross product (a single
    # group passed through verbatim would silently return no data).
    assert fdsn._expand_channel_pattern("[BH]H[ZN]") == "BHZ,BHN,HHZ,HHN"
    with pytest.raises(ArchiveFDSNException, match="Cannot expand"):
        fdsn._expand_channel_pattern("HH[Z-E]")


def test_get_waveforms_and_no_data(fake_service):
    st = fdsn.get_waveforms("ZK", "SKR01", "*", "CH[ZNE]", T0, T0 + 20)
    assert {tr.stats.channel for tr in st} == {"CHZ", "CHN", "CHE"}
    assert all(tr.stats.station == "SKR01" for tr in st)

    empty = fdsn.get_waveforms("ZK", "SKR01", "*", "DL[ZNE]", T0, T0 + 20)
    assert len(empty) == 0


def test_download_archive_layout_and_priorities(fake_service, tmp_path):
    stations = pd.DataFrame({"Name": ["SKR01", "SKR02"]})
    written = fdsn.download_waveform_archive(
        tmp_path / "mSEED", stations, network="ZK",
        starttime=T0, endtime=T0 + 20,
        channel_priorities=["CH[ZNE]", "DL[ZNE]"],
        stationxml_path=tmp_path / "DATALESS",
    )
    # Day layout YEAR/JD/STATION_COMP.m; 2014-06-29 is julday 180
    names = sorted(p.relative_to(tmp_path / "mSEED").as_posix()
                   for p in written)
    assert names == [
        "2014/180/SKR01_E.m", "2014/180/SKR01_N.m", "2014/180/SKR01_Z.m",
        "2014/180/SKR02_E.m", "2014/180/SKR02_N.m", "2014/180/SKR02_Z.m",
    ]
    # SKR02 only has DL? data -> the second channel priority was used
    st = read(str(tmp_path / "mSEED" / "2014" / "180" / "SKR02_Z.m"))
    assert st[0].stats.channel == "DLZ"
    # StationXML sidecars written per station
    assert (tmp_path / "DATALESS" / "ZK.SKR01.xml").exists()
    assert (tmp_path / "DATALESS" / "ZK.SKR02.xml").exists()


def test_write_archive_days_splits_at_midnight(tmp_path):
    # A trace crossing midnight must be filed under BOTH day directories
    # (filed only under its first sample's day, the 2nd day's samples are
    # invisible to the Archive reader's day-directory glob).
    start = UTCDateTime("2014-06-29T23:59:50.0")
    tr = Trace(
        data=np.arange(1000, dtype=np.int32),  # 20 s at 50 Hz
        header=dict(station="SKR01", channel="CHZ", network="ZK",
                    sampling_rate=50.0, starttime=start),
    )
    written = fdsn._write_archive_days(tmp_path, Stream([tr]))
    names = sorted(p.relative_to(tmp_path).as_posix() for p in written)
    assert names == ["2014/180/SKR01_Z.m", "2014/181/SKR01_Z.m"]
    day1 = read(str(tmp_path / "2014" / "180" / "SKR01_Z.m"))[0]
    day2 = read(str(tmp_path / "2014" / "181" / "SKR01_Z.m"))[0]
    # Split on the sample grid: 10 s of day 180, 10 s of day 181, the
    # midnight sample opening day 181, and no samples lost or duplicated.
    assert day1.stats.npts == 500 and day2.stats.npts == 500
    assert day1.stats.endtime < UTCDateTime("2014-06-30T00:00:00")
    assert day2.stats.starttime == UTCDateTime("2014-06-30T00:00:00")
    assert np.array_equal(
        np.concatenate([day1.data, day2.data]), np.arange(1000)
    )


def test_download_chunks_align_to_day_boundaries(fake_service, tmp_path):
    # A multi-day span starting mid-day must produce day files for EVERY
    # day covered (raw start+86400 chunking filed midnight-crossing
    # chunks entirely under the first day).
    stations = pd.DataFrame({"Name": ["SKR01"]})
    written = fdsn.download_waveform_archive(
        tmp_path / "mSEED", stations, network="ZK",
        starttime=UTCDateTime("2014-06-29T23:59:55.0"),
        endtime=UTCDateTime("2014-06-30T00:00:30.0"),
        channel_priorities=["CH[ZNE]"],
    )
    days = sorted({p.parent.name for p in written})
    assert days == ["180", "181"]


def test_stationxml_from_winning_datacentre(fake_service, tmp_path,
                                            monkeypatch):
    # SKR02's data comes from the SECOND data centre; the StationXML
    # query must go there too, not to datacentres[0].
    urls = fake_service
    real_urlopen = fdsn.urllib.request.urlopen

    def urlopen(url, timeout=None):
        if url.startswith("https://service.iris.edu"):
            return _FakeResponse(204)
        return real_urlopen(url, timeout=timeout)

    monkeypatch.setattr(fdsn.urllib.request, "urlopen", urlopen)
    stations = pd.DataFrame({"Name": ["SKR02"]})
    fdsn.download_waveform_archive(
        tmp_path / "mSEED", stations, network="ZK",
        starttime=T0, endtime=T0 + 20,
        channel_priorities=["DL[ZNE]"],
        datacentres=("IRIS", "ORFEUS"),
        stationxml_path=tmp_path / "DATALESS",
    )
    assert (tmp_path / "DATALESS" / "ZK.SKR02.xml").exists()
    station_queries = [u for u in urls if "/fdsnws/station/" in u]
    assert station_queries and all(
        u.startswith("https://www.orfeus-eu.org") for u in station_queries
    )


def test_http_error_raises(monkeypatch):
    import urllib.error

    def urlopen(url, timeout=None):
        raise urllib.error.HTTPError(url, 500, "boom", {}, io.BytesIO())

    monkeypatch.setattr(fdsn.urllib.request, "urlopen", urlopen)
    with pytest.raises(ArchiveFDSNException, match="HTTP 500"):
        fdsn.get_waveforms("ZK", "SKR01", "*", "CHZ", T0, T0 + 20)


def test_http_404_raises(monkeypatch):
    # FDSN's no-data code is 204 unless nodata=404 is requested (which
    # this client never sends) — a 404 is a broken endpoint, not no-data.
    import urllib.error

    def urlopen(url, timeout=None):
        raise urllib.error.HTTPError(url, 404, "none", {}, io.BytesIO())

    monkeypatch.setattr(fdsn.urllib.request, "urlopen", urlopen)
    with pytest.raises(ArchiveFDSNException, match="HTTP 404"):
        fdsn.get_waveforms("ZK", "X", "*", "CHZ", T0, T0 + 20)


def test_http_204_means_no_data(monkeypatch):
    import urllib.error

    def urlopen(url, timeout=None):
        raise urllib.error.HTTPError(url, 204, "none", {}, io.BytesIO())

    monkeypatch.setattr(fdsn.urllib.request, "urlopen", urlopen)
    assert len(fdsn.get_waveforms("ZK", "X", "*", "CHZ", T0, T0 + 20)) == 0
