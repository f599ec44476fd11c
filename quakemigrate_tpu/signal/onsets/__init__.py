# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.signal.onsets -- onset (characteristic) function classes.

"""

from .base import Onset, OnsetData  # noqa: F401
from .stalta import STALTAOnset  # noqa: F401
from .kurtosis import KurtosisOnset  # noqa: F401
