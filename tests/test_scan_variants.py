# -*- coding: utf-8 -*-
"""
QuakeScan variants: kurtosis onsets through the full detect stage,
decimated-grid scanning (the detect-coarse / locate-fine workflow), and
per-timestep continuous scanmseed writing.

"""

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu import QuakeScan, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive
from quakemigrate_tpu.seis import read
from quakemigrate_tpu.signal.onsets import KurtosisOnset, STALTAOnset
from quakemigrate_tpu.synthetics import GaussianDerivativeWavelet, simulate_waveforms

SPS = 100
SOURCE = [0.0, 0.0, 12.0]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("variants")

    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    cproj = Proj(proj="longlat")
    grid_spec = dict(
        ll_corner=[-0.06, -0.06, 0.0],
        ur_corner=[0.06, 0.06, 20.0],
        node_spacing=[1.0, 1.0, 1.0],
        grid_proj=gproj,
        coord_proj=cproj,
    )
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    stations = pd.DataFrame(
        {
            "Name": [f"V{i}" for i in range(8)],
            "Longitude": 0.04 * np.cos(angles),
            "Latitude": 0.04 * np.sin(angles),
            "Elevation": np.zeros(8),
        }
    )
    lut = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P", "S"],
        vp=5.0, vs=3.0,
    )

    wavelet = GaussianDerivativeWavelet(4.0, SPS, 30.0)
    stream = simulate_waveforms(
        wavelet, SOURCE, lut, magnitude=2.0,
        rng=np.random.default_rng(9),
    )
    day_dir = root / "mSEED" / "2021" / "049"
    day_dir.mkdir(parents=True)
    for tr in stream:
        tr.write(str(day_dir / f"{tr.stats.station}_{tr.stats.channel[-1]}.m"),
                 format="MSEED")

    archive = Archive(
        archive_path=root / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION",
    )
    return root, archive, lut


def test_kurtosis_onset_detect(setup):
    root, archive, lut = setup

    onset = KurtosisOnset(sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.kurtosis_windows = {"P": 1.0, "S": 1.0}

    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(root / "runs"),
        run_name="kurt", marginal_window=1.0, timestep=5.0, tile=64,
    )
    scan.detect("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")

    st = read(
        str(root / "runs" / "kurt" / "detect" / "scanmseed"
            / "2021_049.scanmseed")
    )
    coa = st.select(station="COA")[0]
    assert coa.stats.npts == 25 * SPS
    # Kurtosis onsets should still light up the event (wavelet at +30 s).
    # The continuous-COA max wanders within the event's coalescence
    # plateau at this SNR, so the timing check is loose; the functional
    # check is test_kurtosis_trigger_locate, which triggers and locates
    # this same run correctly.
    peak_idx = int(np.argmax(coa.data))
    peak_time = coa.stats.starttime + peak_idx / SPS
    assert abs(peak_time - coa.stats.starttime - 10.0) < 4.0


def test_decimated_grid_detect(setup):
    root, archive, lut = setup

    coarse = lut.decimate([2, 2, 2])
    assert coarse.n_nodes < lut.n_nodes

    onset = STALTAOnset(position="classic", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

    scan = QuakeScan(
        archive, coarse, onset=onset, run_path=str(root / "runs"),
        run_name="coarse", marginal_window=1.0, timestep=5.0, tile=64,
        continuous_scanmseed_write=True,
    )
    scan.detect("2021-02-18T12:00:25.0", "2021-02-18T12:00:40.0")

    st = read(
        str(root / "runs" / "coarse" / "detect" / "scanmseed"
            / "2021_049.scanmseed")
    )
    # Peak location from the coarse scan still lands near the source
    x = st.select(station="X")[0]
    y = st.select(station="Y")[0]
    coa = st.select(station="COA")[0]
    peak = int(np.argmax(coa.data))
    assert abs(x.data[peak] / 1e6 - SOURCE[0]) < 0.03
    assert abs(y.data[peak] / 1e6 - SOURCE[1]) < 0.03


def test_fused_kurtosis_matches_standard(tmp_path):
    """Fused kurtosis window == standard (host-onset) kurtosis detect."""

    import numpy as np
    import pandas as pd

    from quakemigrate_tpu import QuakeScan, compute_traveltimes
    from quakemigrate_tpu.coords import Proj
    from quakemigrate_tpu.io import Archive
    from quakemigrate_tpu.seis import read
    from quakemigrate_tpu.signal.onsets import KurtosisOnset
    from quakemigrate_tpu.synthetics import (
        GaussianDerivativeWavelet,
        simulate_waveforms,
    )

    sps = 100
    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    grid_spec = dict(
        ll_corner=[-0.06, -0.06, 0.0], ur_corner=[0.06, 0.06, 20.0],
        node_spacing=[2.0, 2.0, 2.0], grid_proj=gproj,
        coord_proj=Proj(proj="longlat"),
    )
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    stations = pd.DataFrame(
        {"Name": [f"ST{i:02d}" for i in range(8)],
         "Longitude": 0.045 * np.cos(angles),
         "Latitude": 0.045 * np.sin(angles),
         "Elevation": np.zeros(8)}
    )
    lut = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P", "S"],
        vp=5.0, vs=3.0,
    )
    wavelet = GaussianDerivativeWavelet(4.0, sps, 30.0)
    stream = simulate_waveforms(
        wavelet, [0.0, 0.0, 12.0], lut, magnitude=2.0,
        rng=np.random.default_rng(7),
    )
    day_dir = tmp_path / "mSEED" / "2021" / "049"
    day_dir.mkdir(parents=True)
    for tr in stream:
        tr.write(str(day_dir / f"{tr.stats.station}_{tr.stats.channel[-1]}.m"),
                 format="MSEED")
    archive = Archive(
        archive_path=tmp_path / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION",
    )

    def run(name, fused):
        onset = KurtosisOnset(sampling_rate=sps)
        onset.phases = ["P", "S"]
        onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
        scan = QuakeScan(
            archive, lut, onset=onset, run_path=str(tmp_path / "runs"),
            run_name=name, marginal_window=1.0, timestep=5.0, tile=64,
            fused_detect=fused, precision="double",
        )
        scan.detect("2021-02-18T12:00:20.0", "2021-02-18T12:00:40.0")
        return (
            tmp_path / "runs" / name / "detect" / "scanmseed"
            / "2021_049.scanmseed"
        )

    standard = run("kstd", False)
    fused = run("kfused", True)
    st_s, st_f = read(str(standard)), read(str(fused))
    for ch in ("COA", "COA_N", "X", "Y", "Z"):
        np.testing.assert_array_equal(
            st_s.select(station=ch)[0].data,
            st_f.select(station=ch)[0].data,
            err_msg=ch,
        )


def test_kurtosis_trigger_locate(setup):
    """The full detect -> trigger -> locate chain with kurtosis onsets
    (the picker recomputes kurtosis onsets over the event window)."""

    from quakemigrate_tpu import Trigger

    root, archive, lut = setup

    # reuse the "kurt" detect run from test_kurtosis_onset_detect
    scanmseed = (root / "runs" / "kurt" / "detect" / "scanmseed"
                 / "2021_049.scanmseed")
    assert scanmseed.exists()

    trig = Trigger(lut, run_path=str(root / "runs"), run_name="kurt",
                   marginal_window=1.0, min_event_interval=2.0)
    trig.static_threshold = 1.5
    trig.trigger("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0",
                 interactive_plot=False)
    events = pd.read_csv(
        root / "runs" / "kurt" / "trigger" / "events"
        / "kurt_2021_049_TriggeredEvents.csv"
    )
    assert len(events) >= 1

    onset = KurtosisOnset(sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.kurtosis_windows = {"P": 1.0, "S": 1.0}
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(root / "runs"),
        run_name="kurt", marginal_window=1.0, timestep=5.0, tile=64,
        plot_event_summary=False,
    )
    scan.locate(starttime="2021-02-18T12:00:20.0",
                endtime="2021-02-18T12:00:45.0")

    event_files = list((root / "runs" / "kurt" / "locate" / "events").glob("*.event"))
    pick_files = list((root / "runs" / "kurt" / "locate" / "picks").glob("*.picks"))
    assert event_files and pick_files
    ev = pd.read_csv(event_files[0])
    # location within the grid and not at a corner
    assert -0.06 < ev["X"].iloc[0] < 0.06
    assert 0.0 <= ev["Z"].iloc[0] <= 20.0
    picks = pd.read_csv(pick_files[0])
    assert len(picks) == 16  # 8 stations x P,S rows (picked or -1)
