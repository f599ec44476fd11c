# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.signal -- the scan engine: detect/locate (QuakeScan),
triggering (Trigger), onset functions, phase pickers and local magnitudes.

"""

from .scan import QuakeScan  # noqa: F401
from .trigger import Trigger  # noqa: F401
