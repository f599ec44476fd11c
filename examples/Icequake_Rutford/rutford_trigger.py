# -*- coding: utf-8 -*-
"""
Trigger stage for the Rutford icequake example: sub-second marginal
window / event interval suited to the very short icequake coda.

"""

from quakemigrate_tpu import Trigger
from quakemigrate_tpu.io import read_lut

lut_file = "./outputs/lut/icequake.LUT"
run_path = "./outputs/runs"
run_name = "example_run"

starttime = "2009-01-21T04:00:05.0"
endtime = "2009-01-21T04:00:10.0"

lut = read_lut(lut_file=lut_file)

trig = Trigger(lut, run_path=run_path, run_name=run_name, log=True,
               loglevel="info")

trig.marginal_window = 0.06
trig.min_event_interval = 0.12
trig.normalise_coalescence = True
trig.threshold_method = "static"
trig.static_threshold = 3.0

trig.trigger(starttime, endtime, interactive_plot=False)
