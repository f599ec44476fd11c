# -*- coding: utf-8 -*-
"""
Trigger stage for the Iceland dike intrusion example, with a geographic
region filter around the dike.

"""

from quakemigrate_tpu import Trigger
from quakemigrate_tpu.io import read_lut

lut_file = "./outputs/lut/dike_intrusion.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2014-08-24T00:01:00.0"
endtime = "2014-08-24T00:11:00.0"

lut = read_lut(lut_file=lut_file)

trig = Trigger(lut, run_path=run_path, run_name=run_name, log=True,
               loglevel="info")

trig.marginal_window = 0.75
trig.min_event_interval = 1.5
trig.normalise_coalescence = True
trig.threshold_method = "static"
trig.static_threshold = 1.85
trig.plot_trigger_summary = True
trig.xy_files = "./inputs/XY_FILES/dike_xyfiles.csv"

trig.trigger(
    starttime,
    endtime,
    interactive_plot=False,
    region=[-17.15, 64.72, 0.0, -16.65, 64.93, 14.0],
)
