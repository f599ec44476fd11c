# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.io -- input/output for every stage of the scan pipeline.

"""

from .core import (  # noqa: F401
    Run,
    read_lut,
    read_response_inv,
    read_stations,
    read_vmodel,
    stations,
)
from .data import Archive, WaveformData  # noqa: F401
from .event import Event  # noqa: F401
from .scanmseed import ScanmSEED, read_scanmseed  # noqa: F401
from .triggered_events import (  # noqa: F401
    read_triggered_events,
    write_triggered_events,
)
from .availability import read_availability, write_availability  # noqa: F401
from .coalescence import read_coalescence, write_coalescence  # noqa: F401
from .amplitudes import write_amplitudes  # noqa: F401
from .cut_waveforms import write_cut_waveforms  # noqa: F401
