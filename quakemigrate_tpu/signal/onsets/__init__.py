# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.signal.onsets -- onset (characteristic) function classes.

"""

from .base import Onset, OnsetData  # noqa: F401
from .stalta import (  # noqa: F401
    CentredSTALTAOnset,
    ClassicSTALTAOnset,
    STALTAOnset,
)
from .kurtosis import KurtosisOnset  # noqa: F401
