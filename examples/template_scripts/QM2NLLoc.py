# -*- coding: utf-8 -*-
"""
Template: convert a completed run's picks into NonLinLoc OBS phase
files, one per located event, for relocation with NLLoc.

Mirrors the reference template (reference
examples/template_scripts/QM2NLLoc.py); the reader walks the run's
locate outputs and the writer emits NLLOC_OBS phase blocks from the
GaussianPicker picks (-1 sentinels are skipped).

"""

import pathlib

from quakemigrate_tpu.export import nlloc_obs, read_run

run_dir = "./outputs/runs/example_run"
output_dir = "./outputs/nlloc_obs"

# Units of the run's lookup table grid ("km" or "m")
units = "km"

out = pathlib.Path(output_dir)
out.mkdir(parents=True, exist_ok=True)

for event in read_run(run_dir, units=units):
    obs_file = out / f"{event.uid}.nonlinloc"
    nlloc_obs(event, obs_file)
    print(f"Written {obs_file}")
