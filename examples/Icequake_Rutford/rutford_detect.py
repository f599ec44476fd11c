# -*- coding: utf-8 -*-
"""
Detect stage for the Rutford icequake example: 1 s timesteps over
high-rate (250 Hz+) cryoseismic data with numbered channel components.

"""

from quakemigrate_tpu import QuakeScan
from quakemigrate_tpu.io import Archive, read_lut, read_stations
from quakemigrate_tpu.signal.onsets import STALTAOnset

station_file = "./inputs/rutford_stations.txt"
data_in = "./inputs/mSEED"
lut_out = "./outputs/lut/icequake.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2009-01-21T04:00:05.0"
endtime = "2009-01-21T04:00:10.0"

stations = read_stations(station_file)

archive = Archive(
    archive_path=data_in, stations=stations, archive_format="YEAR/JD/STATION"
)

lut = read_lut(lut_file=lut_out)

onset = STALTAOnset(position="classic", sampling_rate=250)
onset.phases = ["P", "S"]
onset.bandpass_filters = {"P": [20, 124, 4], "S": [10, 124, 4]}
onset.sta_lta_windows = {"P": [0.01, 0.25], "S": [0.05, 0.5]}
onset.channel_maps = {"P": "*1", "S": "*[2,3]"}

scan = QuakeScan(
    archive,
    lut,
    onset=onset,
    run_path=run_path,
    run_name=run_name,
    log=True,
    loglevel="info",
)

scan.timestep = 1.0

scan.detect(starttime, endtime)
