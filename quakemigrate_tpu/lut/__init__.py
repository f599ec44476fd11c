# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.lut -- traveltime lookup tables.

"""

from .lut import Grid3D, LUT  # noqa: F401
from .create import compute_traveltimes, read_nlloc  # noqa: F401
