# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.lut -- traveltime lookup tables.

"""

from .lut import Grid3D, LUT  # noqa: F401
from .create import compute_traveltimes, read_nlloc  # noqa: F401


def update_lut(old_lut_file, save_file):
    """
    Convert an old-format pickled LUT to the current layout and save it
    (reference utility: quakemigrate/lut/__init__.py:31-76).

    Old-format files carry a ``maps`` dict keyed
    ``station -> {"TIME_P": tt, "TIME_S": tt}`` and ``_cell_size`` /
    ``_cell_count`` grid attributes; these become ``traveltimes``
    (``station -> {"P": tt, "S": tt}``) and ``_node_spacing`` /
    ``_node_count``.

    Parameters
    ----------
    old_lut_file : str
        Path of the old-format lookup table.
    save_file : str
        Where to write the converted lookup table.

    """

    from quakemigrate_tpu.io import read_lut

    lut = read_lut(old_lut_file)

    state = lut.__dict__
    if "maps" in state:
        lut.traveltimes = {
            station: {
                phase_label.split("_")[1]: table
                for phase_label, table in phase_tables.items()
            }
            for station, phase_tables in state.pop("maps").items()
        }
    lut.phases = ["P", "S"]
    lut.fraction_tt = 0.1
    if "_cell_size" in state:
        lut.node_spacing = state.pop("_cell_size")
        lut.node_count = state.pop("_cell_count")

    lut.save(save_file)
