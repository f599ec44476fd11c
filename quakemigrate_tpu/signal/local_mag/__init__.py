# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.signal.local_mag -- local magnitude estimation from
Wood-Anderson-corrected waveform amplitudes.

"""

from .local_mag import LocalMag  # noqa: F401
from .amplitude import Amplitude  # noqa: F401
from .magnitude import Magnitude  # noqa: F401
