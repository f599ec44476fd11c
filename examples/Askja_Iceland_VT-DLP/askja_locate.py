# -*- coding: utf-8 -*-
"""
Locate stage for the Askja VT/DLP example: envelope-squared onsets,
Gaussian picking and local magnitudes with the Greenfield (2018) Askja
attenuation curve.

"""

from quakemigrate_tpu import QuakeScan
from quakemigrate_tpu.io import (
    Archive,
    read_lut,
    read_response_inv,
    read_stations,
)
from quakemigrate_tpu.signal.local_mag import LocalMag
from quakemigrate_tpu.signal.onsets import STALTAOnset
from quakemigrate_tpu.signal.pickers import GaussianPicker
from quakemigrate_tpu.util import AttribDict

station_file = "./inputs/askja_stations.txt"
response_file = "./inputs/Z7_dataless.xml"  # StationXML
data_in = "./inputs/mSEED"
lut_file = "./outputs/lut/askja.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2011-10-26T17:35:00.0"
endtime = "2011-10-26T18:05:00.0"

stations = read_stations(station_file)
response_inv = read_response_inv(response_file)

response_params = AttribDict()
response_params.pre_filt = (0.05, 0.06, 20, 23)
response_params.water_level = 60.0
response_params.remove_full_response = False

archive = Archive(
    archive_path=data_in,
    stations=stations,
    archive_format="YEAR/JD/STATION",
    response_inv=response_inv,
    response_removal_params=response_params,
)

amp_params = AttribDict()
amp_params.signal_window = 1.0
amp_params.noise_window = 5.0
amp_params.noise_measure = "ENV"
amp_params.bandpass_filter = True
amp_params.bandpass_lowcut = 2.0
amp_params.bandpass_highcut = 20.0
amp_params.filter_corners = 4

mag_params = AttribDict()
mag_params.A0 = "Greenfield2018_askja"
mag_params.use_hyp_dist = True
mag_params.amp_feature = "S_amp"
mag_params.trace_filter = ".*H[NE]$"
mag_params.noise_filter = 3.0

mags = LocalMag(amp_params=amp_params, mag_params=mag_params,
                plot_amplitudes=True)

lut = read_lut(lut_file=lut_file)

onset = STALTAOnset(
    position="centred", sampling_rate=50, signal_transform="env_squared"
)
onset.phases = ["P", "S"]
onset.bandpass_filters = {"P": [2, 16, 2], "S": [2, 14, 2]}
onset.sta_lta_windows = {"P": [0.2, 1.0], "S": [0.2, 1.0]}

picker = GaussianPicker(onset=onset)
picker.plot_picks = False

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
scan.plot_event_summary = True
scan.xy_files = "./inputs/XY_FILES/askja_xyfiles.csv"
scan.write_cut_waveforms = True

scan.locate(starttime=starttime, endtime=endtime)
