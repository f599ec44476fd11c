# -*- coding: utf-8 -*-
"""
Template: run the locate stage (per-event re-migration, picks, magnitudes).

"""

from quakemigrate_tpu import QuakeScan
from quakemigrate_tpu.io import Archive, read_lut, read_response_inv, read_stations
from quakemigrate_tpu.signal.onsets import STALTAOnset
from quakemigrate_tpu.signal.pickers import GaussianPicker
from quakemigrate_tpu.signal.local_mag import LocalMag

station_file = "./inputs/stations.txt"
response_file = "./inputs/response.xml"
data_in = "./inputs/mSEED"
lut_file = "./outputs/lut/example.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2014-06-29T18:41:55.0"
endtime = "2014-06-29T18:42:20.0"

stations = read_stations(station_file)

# Response inventory (StationXML) -- needed for local magnitudes and
# real/Wood-Anderson cut waveforms
response_inv = read_response_inv(response_file)

archive = Archive(
    archive_path=data_in,
    stations=stations,
    archive_format="YEAR/JD/STATION",
    response_inv=response_inv,
    response_removal_params={"water_level": 60.0},
)

lut = read_lut(lut_file=lut_file)

onset = STALTAOnset(position="centred", sampling_rate=250)
onset.phases = ["P", "S"]
onset.bandpass_filters = {"P": [10, 124, 4], "S": [10, 124, 4]}
onset.sta_lta_windows = {"P": [0.01, 0.25], "S": [0.05, 0.5]}

picker = GaussianPicker(onset=onset)
picker.plot_picks = True

mags = LocalMag(
    amp_params={"signal_window": 5.0, "noise_window": 10.0},
    mag_params={"A0": "Hutton-Boore"},
    plot_amplitudes=True,
)

scan = QuakeScan(
    archive,
    lut,
    onset=onset,
    picker=picker,
    mags=mags,
    run_path=run_path,
    run_name=run_name,
    log=True,
    loglevel="info",
)

scan.marginal_window = 1.0
scan.write_cut_waveforms = True

scan.locate(starttime=starttime, endtime=endtime)
