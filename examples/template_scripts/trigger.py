# -*- coding: utf-8 -*-
"""
Template: run the trigger stage (candidate events from the detect output).

"""

from quakemigrate_tpu import Trigger
from quakemigrate_tpu.io import read_lut

lut_file = "./outputs/lut/example.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2014-06-29T18:41:55.0"
endtime = "2014-06-29T18:42:20.0"

lut = read_lut(lut_file=lut_file)

trig = Trigger(
    lut,
    run_path=run_path,
    run_name=run_name,
    log=True,
    loglevel="info",
)

trig.marginal_window = 1.0
trig.min_event_interval = 2.0
trig.normalise_coalescence = True

# Threshold: "static", "mad" or "median_ratio"
trig.threshold_method = "static"
trig.static_threshold = 1.8
# trig.threshold_method = "mad"
# trig.mad_window_length = 300.
# trig.mad_multiplier = 5.

trig.trigger(starttime, endtime, interactive_plot=False)
# Optionally restrict to a geographic region:
# trig.trigger(starttime, endtime,
#              region=[lon_min, lat_min, z_min, lon_max, lat_max, z_max])
