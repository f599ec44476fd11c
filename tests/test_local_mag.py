# -*- coding: utf-8 -*-
"""
Local magnitude end-to-end: locate with a LocalMag attached, using a
generated StationXML response inventory. Exercises StationXML parsing,
response removal, Wood-Anderson simulation, amplitude measurement, the
.amps file, the network-mean magnitude and the amplitude-vs-distance plot.

"""

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu import QuakeScan, Trigger, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive, read_response_inv
from quakemigrate_tpu.signal.local_mag import LocalMag
from quakemigrate_tpu.signal.onsets import STALTAOnset
from quakemigrate_tpu.synthetics import GaussianDerivativeWavelet, simulate_waveforms

SOURCE = [0.0, 0.0, 15.0]
SPS = 100

_STATIONXML_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
  <Source>quakemigrate_tpu-tests</Source>
  <Created>2021-01-01T00:00:00</Created>
  {networks}
</FDSNStationXML>
"""

_CHANNEL_TEMPLATE = """
      <Channel code="CH{comp}" locationCode="" startDate="2020-01-01T00:00:00">
        <Latitude>{lat}</Latitude>
        <Longitude>{lon}</Longitude>
        <Elevation>0</Elevation>
        <Depth>0</Depth>
        <SampleRate>{sps}</SampleRate>
        <Response>
          <InstrumentSensitivity>
            <Value>{sensitivity}</Value>
            <Frequency>5.0</Frequency>
            <InputUnits><Name>M/S</Name></InputUnits>
            <OutputUnits><Name>COUNTS</Name></OutputUnits>
          </InstrumentSensitivity>
          <Stage number="1">
            <PolesZeros>
              <InputUnits><Name>M/S</Name></InputUnits>
              <OutputUnits><Name>V</Name></OutputUnits>
              <PzTransferFunctionType>LAPLACE (RADIANS/SECOND)</PzTransferFunctionType>
              <NormalizationFactor>1.0</NormalizationFactor>
              <NormalizationFrequency>5.0</NormalizationFrequency>
              <Zero number="0"><Real>0</Real><Imaginary>0</Imaginary></Zero>
              <Zero number="1"><Real>0</Real><Imaginary>0</Imaginary></Zero>
              <Pole number="0"><Real>-19.8</Real><Imaginary>20.2</Imaginary></Pole>
              <Pole number="1"><Real>-19.8</Real><Imaginary>-20.2</Imaginary></Pole>
            </PolesZeros>
          </Stage>
        </Response>
      </Channel>"""


def _make_stationxml(stations, path):
    station_blocks = []
    for _, stn in stations.iterrows():
        channels = "".join(
            _CHANNEL_TEMPLATE.format(
                comp=c, lat=stn.Latitude, lon=stn.Longitude, sps=SPS,
                sensitivity=2.08e6,
            )
            for c in "ZNE"
        )
        station_blocks.append(
            f'    <Station code="{stn.Name}">\n'
            f"      <Latitude>{stn.Latitude}</Latitude>\n"
            f"      <Longitude>{stn.Longitude}</Longitude>\n"
            f"      <Elevation>0</Elevation>\n"
            f"{channels}\n"
            "    </Station>"
        )
    networks = (
        '  <Network code="SC">\n' + "\n".join(station_blocks) + "\n  </Network>"
    )
    path.write_text(_STATIONXML_TEMPLATE.format(networks=networks))


@pytest.fixture(scope="module")
def mag_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("localmag")

    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    cproj = Proj(proj="longlat")
    grid_spec = dict(
        ll_corner=[-0.06, -0.06, 0.0],
        ur_corner=[0.06, 0.06, 20.0],
        node_spacing=[1.0, 1.0, 1.0],
        grid_proj=gproj,
        coord_proj=cproj,
    )
    angles = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    radii = np.linspace(0.008, 0.055, 10)  # varied distances so the
    # amplitude-vs-distance fit has leverage
    stations = pd.DataFrame(
        {
            "Name": [f"ST{i:02d}" for i in range(10)],
            "Longitude": radii * np.cos(angles),
            "Latitude": radii * np.sin(angles),
            "Elevation": np.zeros(10),
        }
    )
    lut = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P", "S"],
        vp=5.0, vs=3.0,
    )

    wavelet = GaussianDerivativeWavelet(4.0, SPS, 30.0)
    stream = simulate_waveforms(
        wavelet, SOURCE, lut, magnitude=2.0, angle_of_incidence=80,
        rng=np.random.default_rng(11),
    )
    day_dir = root / "mSEED" / "2021" / "049"
    day_dir.mkdir(parents=True)
    for tr in stream:
        tr.write(str(day_dir / f"{tr.stats.station}_{tr.stats.channel[-1]}.m"),
                 format="MSEED")

    response_file = root / "response.xml"
    _make_stationxml(stations, response_file)
    response_inv = read_response_inv(str(response_file))

    archive = Archive(
        archive_path=root / "mSEED", stations=stations,
        archive_format="YEAR/JD/STATION", response_inv=response_inv,
        response_removal_params={"water_level": 60.0},
    )

    onset = STALTAOnset(position="classic", sampling_rate=SPS)
    onset.phases = ["P", "S"]
    onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
    onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

    mags = LocalMag(
        amp_params={"signal_window": 1.0, "noise_window": 2.0},
        mag_params={"A0": "Hutton-Boore", "use_hyp_dist": True},
        plot_amplitudes=True,
    )

    run_path, run_name = root / "runs", "mag_run"
    scan = QuakeScan(
        archive, lut, onset=onset, run_path=str(run_path), run_name=run_name,
        marginal_window=1.0, timestep=5.0, mags=mags,
        write_cut_waveforms=True, write_wa_waveforms=True,
    )
    scan.detect("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")
    Trigger(
        lut, run_path=str(run_path), run_name=run_name, marginal_window=1.0,
        min_event_interval=2.0, normalise_coalescence=True,
        static_threshold=1.8, pad=30.0,
    ).trigger("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")
    scan.locate("2021-02-18T12:00:20.0", "2021-02-18T12:00:45.0")

    return run_path / run_name


def test_magnitude_outputs(mag_run):
    event_files = list((mag_run / "locate" / "events").glob("*.event"))
    assert len(event_files) == 1
    event = pd.read_csv(event_files[0]).iloc[0]

    assert "ML" in event.index, ".event file must carry the magnitude"
    ml = float(event["ML"])
    assert np.isfinite(ml)
    assert -2.0 < ml < 6.0
    assert float(event["ML_Err"]) >= 0
    assert float(event["ML_r2"]) > -1.0  # defined; see plot for fit

    amps_files = list((mag_run / "locate" / "amplitudes").glob("*.amps"))
    assert len(amps_files) == 1
    amps = pd.read_csv(amps_files[0], index_col=0)
    assert len(amps) == 30  # 10 stations x 3 components
    assert amps["S_amp"].notna().sum() > 20
    assert amps["ML"].notna().sum() > 20

    plots = list((mag_run / "locate" / "amplitude_plots").glob("*.pdf"))
    assert len(plots) == 1

    # Cut waveforms written
    raw = list((mag_run / "locate" / "raw_cut_waveforms").glob("*.m"))
    wa = list((mag_run / "locate" / "wa_cut_waveforms").glob("*.m"))
    assert len(raw) == 1 and len(wa) == 1
