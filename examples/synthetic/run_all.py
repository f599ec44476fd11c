# -*- coding: utf-8 -*-
"""
Self-contained synthetic example: build a LUT, simulate waveforms for a
known source, run detect -> trigger -> locate, and report the recovered
location against the planted one. No external data or binaries needed.

    python run_all.py

"""

import pathlib

import numpy as np
import pandas as pd

from quakemigrate_tpu import QuakeScan, Trigger, compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import Archive, read_lut, read_stations, read_vmodel
from quakemigrate_tpu.signal.onsets import STALTAOnset
from quakemigrate_tpu.synthetics import GaussianDerivativeWavelet, simulate_waveforms
from quakemigrate_tpu.util import AttribDict

HERE = pathlib.Path(__file__).parent
SOURCE = [0.0, 0.0, 15.0]  # lon, lat, depth (km)
SPS = 100

# --- 0. LUT ---
stations = read_stations(HERE / "inputs" / "synthetic_stations.txt")
vmodel = read_vmodel(HERE / "inputs" / "velocity_model.csv")

gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0, ellps="WGS84")
cproj = Proj(proj="longlat", ellps="WGS84")

grid_spec = AttribDict()
grid_spec.ll_corner = [-0.15, -0.15, 0.0]
grid_spec.ur_corner = [0.15, 0.15, 30.0]
grid_spec.node_spacing = [1.0, 1.0, 1.0]
grid_spec.grid_proj = gproj
grid_spec.coord_proj = cproj

lut_file = HERE / "outputs" / "lut" / "synthetic.LUT"
lut = compute_traveltimes(
    grid_spec, stations, method="1dsweep", phases=["P", "S"], vmod=vmodel,
    save_file=str(lut_file),
)

# --- 1. Simulate waveforms ---
wavelet = GaussianDerivativeWavelet(4.0, SPS, 150.0)
stream = simulate_waveforms(
    wavelet, SOURCE, lut, magnitude=2.2, angle_of_incidence=80,
    rng=np.random.default_rng(4),
)
day_dir = HERE / "inputs" / "mSEED" / "2021" / "049"
day_dir.mkdir(parents=True, exist_ok=True)
for tr in stream:
    tr.write(str(day_dir / f"{tr.stats.station}_{tr.stats.channel[-1]}.m"),
             format="MSEED")

# --- 2. Detect ---
archive = Archive(
    archive_path=HERE / "inputs" / "mSEED", stations=stations,
    archive_format="YEAR/JD/STATION",
)
lut = read_lut(lut_file=str(lut_file))

onset = STALTAOnset(position="classic", sampling_rate=SPS)
onset.phases = ["P", "S"]
onset.bandpass_filters = {"P": [1, 12, 2], "S": [1, 12, 2]}
onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

run_path = HERE / "outputs" / "runs"
run_name = "synthetic_example"
scan = QuakeScan(
    archive, lut, onset=onset, run_path=str(run_path), run_name=run_name,
    log=True, marginal_window=1.0, timestep=15.0,
)
scan.detect("2021-02-18T12:01:45.0", "2021-02-18T12:03:00.0")

# --- 3. Trigger ---
trig = Trigger(
    lut, run_path=str(run_path), run_name=run_name, log=True,
    marginal_window=1.0, min_event_interval=6.0,
    normalise_coalescence=True, static_threshold=1.5, pad=60.0,
)
trig.trigger("2021-02-18T12:01:45.0", "2021-02-18T12:03:00.0")

# --- 4. Locate ---
scan.locate("2021-02-18T12:01:45.0", "2021-02-18T12:03:00.0")

# --- Check recovery ---
events = sorted((run_path / run_name / "locate" / "events").glob("*.event"))
assert events, "no events located!"
event = pd.read_csv(events[0]).iloc[0]
print("\n" + "=" * 60)
print(f"Planted source:   lon {SOURCE[0]:+.4f}  lat {SOURCE[1]:+.4f}  "
      f"z {SOURCE[2]:.2f} km")
print(f"Recovered source: lon {event['X']:+.4f}  lat {event['Y']:+.4f}  "
      f"z {event['Z']:.2f} km")
print(f"Origin time: {event['DT']} (wavelet zero time 12:02:30)")
print("=" * 60)
