# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.export -- post-hoc export of run outputs to external
formats: QuakeML (ObsPy-compatible), NonLinLoc OBS phase files, Snuffler
station/marker files and MFAST SAC files.

"""

from .catalog import EventRecord, read_run  # noqa: F401
from .to_quakeml import read_quakemigrate, write_quakeml  # noqa: F401
from .to_nlloc import nlloc_obs  # noqa: F401
from .to_snuffler import snuffler_markers, snuffler_stations  # noqa: F401
from .to_mfast import sac_mfast  # noqa: F401
