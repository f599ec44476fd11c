# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.plot -- summary figures for each pipeline stage.

"""

import os

import matplotlib

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")

from .event import event_summary  # noqa: E402,F401
from .trigger import trigger_summary  # noqa: E402,F401
from .phase_picks import pick_summary  # noqa: E402,F401
from .amplitudes import amplitudes_summary  # noqa: E402,F401
