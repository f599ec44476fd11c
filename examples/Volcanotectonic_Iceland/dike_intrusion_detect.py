# -*- coding: utf-8 -*-
"""
Detect stage for the Iceland dike intrusion example: 50 Hz regional VT
scan with envelope-squared onsets.

"""

from quakemigrate_tpu import QuakeScan
from quakemigrate_tpu.io import Archive, read_lut, read_stations
from quakemigrate_tpu.signal.onsets import STALTAOnset

station_file = "./inputs/iceland_stations.txt"
data_in = "./inputs/mSEED"
lut_file = "./outputs/lut/dike_intrusion.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2014-08-24T00:01:00.0"
endtime = "2014-08-24T00:11:00.0"

stations = read_stations(station_file)

archive = Archive(
    archive_path=data_in, stations=stations, archive_format="YEAR/JD/STATION",
    resample=True, upfactor=2,
)

lut = read_lut(lut_file=lut_file)

onset = STALTAOnset(
    position="classic", sampling_rate=50, signal_transform="env_squared"
)
onset.phases = ["P", "S"]
onset.bandpass_filters = {"P": [2, 16, 2], "S": [2, 16, 2]}
onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

scan = QuakeScan(
    archive,
    lut,
    onset=onset,
    run_path=run_path,
    run_name=run_name,
    log=True,
    loglevel="info",
)

scan.timestep = 300.0

scan.detect(starttime, endtime)
