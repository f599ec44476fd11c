# -*- coding: utf-8 -*-
"""
Detect-stage edge cases: runs crossing a day boundary (scanmseed day
splitting + residual write), missing-data timesteps (zero-filled blocks,
availability 0), and gappy data with allow_gaps.

"""

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu import QuakeScan, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive
from quakemigrate_tpu.seis import Stream, Trace, UTCDateTime, read
from quakemigrate_tpu.signal.onsets import STALTAOnset

SPS = 50


@pytest.fixture(scope="module")
def small_lut():
    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    cproj = Proj(proj="longlat")
    grid_spec = dict(
        ll_corner=[-0.03, -0.03, 0.0],
        ur_corner=[0.03, 0.03, 10.0],
        node_spacing=[2.0, 2.0, 2.0],
        grid_proj=gproj,
        coord_proj=cproj,
    )
    angles = np.linspace(0, 2 * np.pi, 4, endpoint=False)
    stations = pd.DataFrame(
        {
            "Name": [f"S{i}" for i in range(4)],
            "Longitude": 0.02 * np.cos(angles),
            "Latitude": 0.02 * np.sin(angles),
            "Elevation": np.zeros(4),
        }
    )
    lut = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P", "S"],
        vp=5.0, vs=3.0,
    )
    return lut, stations


def _write_noise_archive(root, stations, start, duration, gap=None):
    """Random-noise archive; optional (gap_start, gap_end) per station S0."""

    rng = np.random.default_rng(0)
    start = UTCDateTime(start)
    for day_offset in range(int(np.ceil(duration / 86400)) + 1):
        t0 = start + day_offset * 86400
        if t0 >= start + duration:
            break
    n = int(duration * SPS) + 1
    for _, stn in stations.iterrows():
        for comp in "ZNE":
            tr = Trace(
                rng.normal(size=n),
                {"station": stn.Name, "channel": f"HH{comp}",
                 "network": "XX", "starttime": start,
                 "sampling_rate": float(SPS)},
            )
            traces = [tr]
            if gap is not None and stn.Name == "S0":
                a = tr.slice(endtime=UTCDateTime(gap[0]))
                b = tr.slice(starttime=UTCDateTime(gap[1]))
                traces = [a, b]
            for k, t in enumerate(traces):
                day = UTCDateTime(t.stats.starttime.date)
                day_dir = root / f"{day.year}" / f"{day.julday:03d}"
                day_dir.mkdir(parents=True, exist_ok=True)
                t.write(str(day_dir / f"{stn.Name}_{comp}_{k}.m"),
                        format="MSEED")


def _scan(root, stations, lut, run_name, **kwargs):
    archive = Archive(
        archive_path=root, stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = STALTAOnset(position="classic", sampling_rate=SPS, **kwargs)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
    return QuakeScan(
        archive, lut, onset=onset, run_path=str(root.parent / "runs"),
        run_name=run_name, marginal_window=1.0, timestep=10.0, tile=64,
    )


def test_day_boundary_split(tmp_path, small_lut):
    lut, stations = small_lut
    # 2 minutes straddling midnight
    _write_noise_archive(
        tmp_path / "archive", stations, "2021-03-01T23:58:00.0", 240.0
    )
    scan = _scan(tmp_path / "archive", stations, lut, "boundary")
    scan.detect("2021-03-01T23:59:00.0", "2021-03-02T00:01:00.0")

    scandir = tmp_path / "runs" / "boundary" / "detect" / "scanmseed"
    day1 = scandir / "2021_060.scanmseed"
    day2 = scandir / "2021_061.scanmseed"
    assert day1.exists() and day2.exists()

    st1, st2 = read(str(day1)), read(str(day2))
    coa1 = st1.select(station="COA")[0]
    coa2 = st2.select(station="COA")[0]
    # Day 1 ends at the last sample before midnight; day 2 starts at it
    assert coa1.stats.endtime == UTCDateTime("2021-03-02") - 1 / SPS
    assert coa2.stats.starttime == UTCDateTime("2021-03-02")
    assert coa1.stats.npts + coa2.stats.npts == 120 * SPS

    avail_dir = tmp_path / "runs" / "boundary" / "detect" / "availability"
    assert (avail_dir / "2021_060_StationAvailability.csv").exists()
    assert (avail_dir / "2021_061_StationAvailability.csv").exists()


def test_missing_data_zero_fill(tmp_path, small_lut):
    lut, stations = small_lut
    # Data only covers the first half of the scan
    _write_noise_archive(
        tmp_path / "archive", stations, "2021-03-05T10:00:00.0", 40.0
    )
    scan = _scan(tmp_path / "archive", stations, lut, "gappy")
    scan.detect("2021-03-05T10:00:10.0", "2021-03-05T10:00:50.0")

    scandir = tmp_path / "runs" / "gappy" / "detect" / "scanmseed"
    st = read(str(scandir / "2021_064.scanmseed"))
    coa = st.select(station="COA")[0]
    assert coa.stats.npts == 40 * SPS
    # Last timestep had no usable data -> zero-filled
    assert (coa.data[-10 * SPS:] == 0).all()
    assert coa.data[: 10 * SPS].max() > 0

    avail = pd.read_csv(
        tmp_path / "runs" / "gappy" / "detect" / "availability"
        / "2021_064_StationAvailability.csv",
        index_col=0,
    )
    assert avail.iloc[0].sum() == 8  # 4 stations x 2 phases available
    assert avail.iloc[-1].sum() == 0


def test_allow_gaps_keeps_station(tmp_path, small_lut):
    lut, stations = small_lut
    _write_noise_archive(
        tmp_path / "archive", stations, "2021-03-08T10:00:00.0", 60.0,
        gap=("2021-03-08T10:00:20.0", "2021-03-08T10:00:25.0"),
    )
    # Without allow_gaps: S0 unavailable in the window containing the gap
    scan = _scan(tmp_path / "archive", stations, lut, "nogaps")
    scan.detect("2021-03-08T10:00:10.0", "2021-03-08T10:00:40.0")
    avail = pd.read_csv(
        tmp_path / "runs" / "nogaps" / "detect" / "availability"
        / "2021_067_StationAvailability.csv",
        index_col=0,
    )
    assert avail["S0_P"].iloc[1] == 0
    assert avail["S1_P"].iloc[1] == 1

    # With allow_gaps: S0 contributes (gap padded)
    scan2 = _scan(
        tmp_path / "archive", stations, lut, "withgaps", allow_gaps=True,
        full_timespan=False,
    )
    scan2.detect("2021-03-08T10:00:10.0", "2021-03-08T10:00:40.0")
    avail2 = pd.read_csv(
        tmp_path / "runs" / "withgaps" / "detect" / "availability"
        / "2021_067_StationAvailability.csv",
        index_col=0,
    )
    assert avail2["S0_P"].iloc[1] == 1


def test_batch_mid_failure_keeps_chronological_appends(
    tmp_path, small_lut, monkeypatch
):
    """
    With detect_batch > 1, a failed step mid-batch must not have its
    zero-filled block appended before the SAME batch's earlier successful
    steps (regression: only previous batches were flushed on failure).

    """

    from quakemigrate_tpu.io.scanmseed import ScanmSEED

    lut, stations = small_lut
    # Gap across all stations at 29-32 s (data seconds; scan starts at
    # data second 10). With this fixture's pads (pre 3.6 s, post 9.0 s)
    # the 10 s scan windows span [10i+6.4, 10i+29) data seconds, so
    # steps 1-2 fail while steps 0, 3 and 4 succeed -- step 0 is
    # prepared in the same batch BEFORE step 1's failure, which is the
    # regression shape.
    root = tmp_path / "archive"
    rng = np.random.default_rng(1)
    start = UTCDateTime("2021-03-10T10:00:00.0")
    n = int(70 * SPS) + 1
    for _, stn in stations.iterrows():
        for comp in "ZNE":
            tr = Trace(
                rng.normal(size=n),
                {"station": stn.Name, "channel": f"HH{comp}",
                 "network": "XX", "starttime": start,
                 "sampling_rate": float(SPS)},
            )
            a = tr.slice(endtime=start + 29.0)
            b = tr.slice(starttime=start + 32.0)
            day_dir = root / "2021" / "069"
            day_dir.mkdir(parents=True, exist_ok=True)
            for k, t in enumerate((a, b)):
                t.write(str(day_dir / f"{stn.Name}_{comp}_{k}.m"),
                        format="MSEED")

    appended = []
    orig_append = ScanmSEED.append

    def spy(self, starttime, *args, **kwargs):
        appended.append(starttime)
        return orig_append(self, starttime, *args, **kwargs)

    monkeypatch.setattr(ScanmSEED, "append", spy)

    archive = Archive(
        archive_path=root, stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = STALTAOnset(position="classic", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(tmp_path / "runs"),
        run_name="midgap", marginal_window=1.0, timestep=10.0, tile=64,
        detect_batch=5, fused_detect=False,
    )
    scan.detect("2021-03-10T10:00:10.0", "2021-03-10T10:01:00.0")

    assert appended == sorted(appended)
    assert len(appended) == 5

    st = read(
        str(tmp_path / "runs" / "midgap" / "detect" / "scanmseed"
            / "2021_069.scanmseed")
    )
    coa = st.select(station="COA")[0]
    assert coa.stats.npts == 50 * SPS
    # Steps 1-2 zero-filled, steps 0, 3 and 4 nonzero
    assert (coa.data[10 * SPS:30 * SPS] == 0).all()
    assert coa.data[:10 * SPS].max() > 0
    assert coa.data[30 * SPS:40 * SPS].max() > 0
    assert coa.data[40 * SPS:].max() > 0


@pytest.mark.filterwarnings("error::RuntimeWarning")
def test_kurtosis_allow_gaps(tmp_path, small_lut):
    """
    KurtosisOnset with allow_gaps=True must gap-fill via the shared
    availability helper instead of crashing on ragged trace segments
    (regression: the kurtosis path skipped _fill_gaps), and the filled
    near-constant windows must not explode the kurtosis ratio into
    overflowing coalescence (regression: degenerate-window gating).

    """

    from quakemigrate_tpu.signal.onsets import KurtosisOnset

    lut, stations = small_lut
    _write_noise_archive(
        tmp_path / "archive", stations, "2021-03-12T10:00:00.0", 60.0,
        gap=("2021-03-12T10:00:20.0", "2021-03-12T10:00:25.0"),
    )
    archive = Archive(
        archive_path=tmp_path / "archive", stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    onset = KurtosisOnset(
        sampling_rate=SPS, allow_gaps=True, full_timespan=False
    )
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(tmp_path / "runs"),
        run_name="kurtgap", marginal_window=1.0, timestep=10.0, tile=64,
        fused_detect=False,
    )
    scan.detect("2021-03-12T10:00:10.0", "2021-03-12T10:00:40.0")

    avail = pd.read_csv(
        tmp_path / "runs" / "kurtgap" / "detect" / "availability"
        / "2021_071_StationAvailability.csv",
        index_col=0,
    )
    # The gappy S0 stays available because gaps are tolerated and filled
    assert avail["S0_P"].iloc[1] == 1
    assert avail.iloc[1].sum() == 8

    st = read(
        str(tmp_path / "runs" / "kurtgap" / "detect" / "scanmseed"
            / "2021_071.scanmseed")
    )
    coa = st.select(station="COA")[0].data
    # Sane coalescence: no ceiling-clamped garbage at gap boundaries
    assert coa.min() >= 0
    assert coa.max() < 21474000  # well below the int32 scaling ceiling


def test_archive_glob_matching_directory_is_skipped(tmp_path, small_lut):
    """A subdirectory matched by the archive glob must be skipped, not
    crash the scan with IsADirectoryError (regression)."""

    lut, stations = small_lut
    _write_noise_archive(
        tmp_path / "archive", stations, "2021-03-15T10:00:00.0", 40.0
    )
    # Directory whose name matches the STATION glob inside the day dir
    (tmp_path / "archive" / "2021" / "074" / "S0_extracted").mkdir()

    scan = _scan(tmp_path / "archive", stations, lut, "dirglob")
    scan.detect("2021-03-15T10:00:10.0", "2021-03-15T10:00:30.0")
    st = read(
        str(tmp_path / "runs" / "dirglob" / "detect" / "scanmseed"
            / "2021_074.scanmseed")
    )
    assert st.select(station="COA")[0].stats.npts == 20 * SPS
