# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.ops -- the device compute programs (JAX/XLA/Pallas):
onset functions and migration/stacking kernels.

"""

from .migrate import (  # noqa: F401
    DEFAULT_TILE,
    detect_reduce,
    find_max_coa,
    migrate_detect,
    migrate_map,
)
from .stalta import (  # noqa: F401
    centred_sta_lta,
    overlapping_sta_lta,
    recursive_sta_lta,
    signal_transform,
)
