# -*- coding: utf-8 -*-
"""
Locate stage for the Rutford icequake example: centred onsets and
Gaussian picking on high-rate data with numbered channel components.

"""

from quakemigrate_tpu import QuakeScan
from quakemigrate_tpu.io import Archive, read_lut, read_stations
from quakemigrate_tpu.signal.onsets import STALTAOnset
from quakemigrate_tpu.signal.pickers import GaussianPicker

station_file = "./inputs/rutford_stations.txt"
data_in = "./inputs/mSEED"
lut_file = "./outputs/lut/icequake.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2009-01-21T04:00:05.0"
endtime = "2009-01-21T04:00:10.0"

stations = read_stations(station_file)

archive = Archive(
    archive_path=data_in, stations=stations, archive_format="YEAR/JD/STATION"
)

lut = read_lut(lut_file=lut_file)

onset = STALTAOnset(position="centred", sampling_rate=250)
onset.phases = ["P", "S"]
onset.bandpass_filters = {"P": [20, 124, 4], "S": [10, 124, 4]}
onset.sta_lta_windows = {"P": [0.01, 0.25], "S": [0.05, 0.5]}
onset.channel_maps = {"P": "*[1]", "S": "*[2,3]"}

picker = GaussianPicker(onset=onset)
picker.plot_picks = True

scan = QuakeScan(
    archive,
    lut,
    onset=onset,
    picker=picker,
    run_path=run_path,
    run_name=run_name,
    log=True,
    loglevel="info",
)

scan.marginal_window = 0.06
scan.plot_event_summary = True
scan.write_cut_waveforms = True

scan.locate(starttime=starttime, endtime=endtime)
