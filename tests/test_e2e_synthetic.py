# -*- coding: utf-8 -*-
"""
End-to-end pipeline test: simulate waveforms for a known source using the
LUT's own traveltimes, write them to a miniSEED archive, run
detect -> trigger -> locate, and verify the recovered event location and
origin time (the native analogue of the reference's examples/synthetic
ground-truth validation).

"""

import pathlib

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu import QuakeScan, Trigger, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive, read_lut
from quakemigrate_tpu.seis import UTCDateTime
from quakemigrate_tpu.signal.onsets import STALTAOnset
from quakemigrate_tpu.synthetics import GaussianDerivativeWavelet, simulate_waveforms

SOURCE = [0.0, 0.0, 15.0]  # lon, lat, depth (km)
VP, VS = 5.0, 3.0
SPS = 100


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")

    # --- Build LUT ---
    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0, ellps="WGS84")
    cproj = Proj(proj="longlat", ellps="WGS84")
    grid_spec = dict(
        ll_corner=[-0.06, -0.06, 0.0],
        ur_corner=[0.06, 0.06, 20.0],
        node_spacing=[1.0, 1.0, 1.0],
        grid_proj=gproj,
        coord_proj=cproj,
    )
    rng = np.random.default_rng(4)
    angles = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    stations = pd.DataFrame(
        {
            "Name": [f"ST{i:02d}" for i in range(10)],
            "Longitude": 0.045 * np.cos(angles),
            "Latitude": 0.045 * np.sin(angles),
            "Elevation": np.zeros(10),
        }
    )

    lut_file = root / "lut" / "synthetic.LUT"
    lut = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P", "S"],
        vp=VP, vs=VS, save_file=str(lut_file),
    )

    # --- Simulate waveforms and write a YEAR/JD/STATION archive ---
    wavelet = GaussianDerivativeWavelet(4.0, SPS, 30.0)
    stream = simulate_waveforms(
        wavelet, SOURCE, lut, magnitude=2.0, angle_of_incidence=80,
        rng=np.random.default_rng(4),
    )
    archive_path = root / "mSEED"
    day_dir = archive_path / "2021" / "049"
    day_dir.mkdir(parents=True)
    for tr in stream:
        fname = day_dir / f"{tr.stats.station}_{tr.stats.channel[-1]}.m"
        tr.write(str(fname), format="MSEED")

    return root, stations, archive_path, lut_file


@pytest.fixture(scope="module")
def run_outputs(workspace):
    root, stations, archive_path, lut_file = workspace
    run_path = root / "runs"
    run_name = "synthetic_run"

    archive = Archive(
        archive_path=archive_path, stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    lut = read_lut(lut_file=str(lut_file))

    onset = STALTAOnset(position="classic", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(run_path),
        run_name=run_name, log=False, loglevel="info",
        marginal_window=1.0, timestep=5.0,
    )

    # --- detect ---
    scan.detect("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")

    # --- trigger ---
    trig = Trigger(
        lut, run_path=str(run_path), run_name=run_name, log=False,
        marginal_window=1.0, min_event_interval=2.0,
        normalise_coalescence=True, static_threshold=1.8,
        threshold_method="static", pad=30.0,
    )
    trig.trigger("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")

    # --- locate ---
    scan.locate("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")

    return run_path / run_name, lut


def test_detect_outputs(run_outputs):
    run_dir, lut = run_outputs
    scanmseed = run_dir / "detect" / "scanmseed" / "2021_049.scanmseed"
    assert scanmseed.exists()

    from quakemigrate_tpu.seis import read

    st = read(str(scanmseed))
    assert {tr.stats.station for tr in st} == {"COA", "COA_N", "X", "Y", "Z"}
    coa = st.select(station="COA")[0]
    assert coa.stats.sampling_rate == SPS
    # 25 seconds of scan output
    assert coa.stats.npts == 25 * SPS
    # There must be a strong coalescence peak (the event)
    assert coa.data.max() / 1e5 > 2.0

    availability = (
        run_dir / "detect" / "availability" /
        "2021_049_StationAvailability.csv"
    )
    assert availability.exists()
    avail = pd.read_csv(availability, index_col=0)
    assert avail.values.all(), "all stations should be available"


def test_triggered_event(run_outputs):
    run_dir, lut = run_outputs
    trigger_file = (
        run_dir / "trigger" / "events" /
        "synthetic_run_2021_049_TriggeredEvents.csv"
    )
    assert trigger_file.exists()
    events = pd.read_csv(trigger_file)
    assert len(events) == 1, f"expected exactly 1 event, got {len(events)}"

    event = events.iloc[0]
    # Trigger location should be within a couple of nodes of the source
    assert abs(event["COA_X"] - SOURCE[0]) < 0.02
    assert abs(event["COA_Y"] - SOURCE[1]) < 0.02
    assert abs(event["COA_Z"] - SOURCE[2]) < 2.0

    # The trigger summary figure (traces + availability + LUT
    # cross-section scatter) is written alongside
    summary = (
        run_dir / "trigger" / "summaries" /
        "synthetic_run_2021_049_Trigger.pdf"
    )
    assert summary.exists() and summary.stat().st_size > 10_000


def test_located_event(run_outputs):
    run_dir, lut = run_outputs
    event_files = list((run_dir / "locate" / "events").glob("*.event"))
    assert len(event_files) == 1
    event = pd.read_csv(event_files[0]).iloc[0]

    # Location within ~1.5 node spacings (1 km) of the planted source
    deg_per_km_lat = 1 / 111.2
    assert abs(event["X"] - SOURCE[0]) < 1.5 * deg_per_km_lat
    assert abs(event["Y"] - SOURCE[1]) < 1.5 * deg_per_km_lat
    assert abs(event["Z"] - SOURCE[2]) < 1.5

    # Gaussian + covariance results present and sane
    assert event["GAU_ErrX"] > 0
    assert event["COV_Err_XYZ"] > 0

    # Origin time within a marginal window of the wavelet zero time
    otime = UTCDateTime(event["DT"])
    expected = UTCDateTime("2021-02-18T12:00:30.0")
    assert abs(otime - expected) < 1.5

    # Picks file with P and S rows for the stations
    pick_files = list((run_dir / "locate" / "picks").glob("*.picks"))
    assert len(pick_files) == 1
    picks = pd.read_csv(pick_files[0])
    assert set(picks["Phase"]) == {"P", "S"}
    made = picks[picks["PickTime"] != "-1"]
    assert len(made) > 10, "most picks should succeed on clean synthetics"

    # Pick residuals should be small (sub-0.2 s) for made picks
    resid = made["Residual"].astype(float).abs()
    assert resid.median() < 0.2

    # Summary plot produced
    plots = list((run_dir / "locate" / "summaries").glob("*.pdf"))
    assert len(plots) == 1


def test_exports(run_outputs, tmp_path):
    """QuakeML / NLLoc / Snuffler exports from the completed run."""

    run_dir, lut = run_outputs
    from quakemigrate_tpu.export import (
        nlloc_obs,
        read_run,
        snuffler_markers,
        snuffler_stations,
        write_quakeml,
    )

    records = write_quakeml(run_dir, tmp_path / "catalog.xml", units="km")
    assert len(records) == 1
    xml = (tmp_path / "catalog.xml").read_text()
    assert "<q:quakeml" in xml and "<origin " in xml and "<pick " in xml
    import xml.etree.ElementTree as ET

    ET.fromstring(xml)  # must be well-formed

    event = records[0]
    assert abs(event.longitude - SOURCE[0]) < 0.02
    assert abs(event.depth_km - SOURCE[2]) < 1.5

    nlloc_obs(event, tmp_path / "event.obs")
    obs = (tmp_path / "event.obs").read_text()
    assert "GAU" in obs and len(obs.splitlines()) > 10

    snuffler_markers(event, tmp_path)
    markers = (tmp_path / event.uid / f"{event.uid}.markers").read_text()
    assert markers.startswith("# Snuffler Markers File")
    assert "phase:" in markers

    stations = lut.station_data
    snuffler_stations(stations, tmp_path, "stations.txt", network_code="SC")
    assert len((tmp_path / "stations.txt").read_text().splitlines()) == 10


def test_event_video(run_outputs, workspace):
    """Coalescence video renders from a re-located event's map4d."""

    root, stations, archive_path, lut_file = workspace
    run_path = root / "runs"

    archive = Archive(
        archive_path=archive_path, stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    lut = read_lut(lut_file=str(lut_file))
    onset = STALTAOnset(position="classic", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(run_path),
        run_name="video_run", marginal_window=1.0, timestep=5.0,
        plot_event_summary=False, plot_event_video=True,
    )
    trigger_file = (
        run_path / "synthetic_run" / "trigger" / "events"
        / "synthetic_run_2021_049_TriggeredEvents.csv"
    )
    scan.locate(trigger_file=str(trigger_file))

    videos = list(
        (run_path / "video_run" / "locate" / "videos").glob("*.gif")
    )
    assert len(videos) == 1
    assert videos[0].stat().st_size > 10000


def test_two_pass_locate_matches_full_map(run_outputs, workspace):
    """Map-free (two-pass) locate must reproduce the full-map results.

    The map-retaining path now engages only when the full map is
    actually consumed on host (write_coalescence / plot_event_video):
    fetching O(nodes x samples) bytes per event otherwise dominated
    locate at regional grids. So the full-map reference run here forces
    retention via write_coalescence."""

    root, stations, archive_path, lut_file = workspace
    run_path = root / "runs"

    archive = Archive(
        archive_path=archive_path, stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    lut = read_lut(lut_file=str(lut_file))

    def make_scan(name, **kwargs):
        onset = STALTAOnset(position="classic", sampling_rate=SPS)
        onset.phases = ["P", "S"]
        onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
        onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}
        return QuakeScan(
            archive, lut, onset=onset, run_path=str(run_path),
            run_name=name, marginal_window=1.0, timestep=5.0,
            plot_event_summary=False, **kwargs,
        )

    trigger_file = (
        run_path / "synthetic_run" / "trigger" / "events"
        / "synthetic_run_2021_049_TriggeredEvents.csv"
    )
    scan_full = make_scan("fullmap", write_coalescence=True)
    scan_full.locate(trigger_file=str(trigger_file))
    # The full map must actually have been written (retention engaged)
    assert list(
        (run_path / "fullmap" / "locate" / "coalescence_maps").glob("*.npy")
    ), "full-map run did not retain/write the coalescence map"

    scan = make_scan("twopass", locate_map_memory_limit=0)
    scan.locate(trigger_file=str(trigger_file))

    full = pd.read_csv(
        next((run_path / "fullmap" / "locate" / "events").glob("*.event"))
    ).iloc[0]
    twopass = pd.read_csv(
        next((run_path / "twopass" / "locate" / "events").glob("*.event"))
    ).iloc[0]

    assert twopass["DT"] == full["DT"]
    for col in ("X", "Y", "Z", "COA", "COA_NORM", "GAU_X", "GAU_Y", "GAU_Z"):
        assert twopass[col] == pytest.approx(full[col], abs=1e-6), col
