# -*- coding: utf-8 -*-
"""
update_lut: old-format pickled LUTs (maps/TIME_P keys, _cell_size/_cell_count
grid attributes) convert to the current layout and load cleanly.

"""

import pickle

import numpy as np

from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import read_lut
from quakemigrate_tpu.lut import LUT, update_lut


def _make_current_lut():
    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    cproj = Proj(proj="longlat")
    lut = LUT(
        ll_corner=[-0.05, -0.05, 0.0],
        ur_corner=[0.05, 0.05, 10.0],
        node_spacing=[1.0, 1.0, 1.0],
        grid_proj=gproj,
        coord_proj=cproj,
    )
    shape = tuple(lut.node_count)
    rng = np.random.default_rng(7)
    lut.traveltimes = {
        "ST01": {"P": rng.random(shape), "S": rng.random(shape) * 2},
        "ST02": {"P": rng.random(shape), "S": rng.random(shape) * 2},
    }
    lut.phases = ["P", "S"]

    import pandas as pd

    lut.station_data = pd.DataFrame(
        {"Name": ["ST01", "ST02"], "Longitude": [0.0, 0.01],
         "Latitude": [0.0, 0.01], "Elevation": [0.0, 0.0]}
    )
    return lut


def test_update_lut_roundtrip(tmp_path):
    lut = _make_current_lut()

    # Forge the old on-disk layout from the current state.
    old_state = dict(lut.__dict__)
    old_state["maps"] = {
        station: {f"TIME_{ph}": tt for ph, tt in tables.items()}
        for station, tables in old_state.pop("traveltimes").items()
    }
    old_state["_cell_size"] = old_state.pop("_node_spacing")
    old_state["_cell_count"] = old_state.pop("_node_count")
    del old_state["phases"], old_state["fraction_tt"]

    old_file = tmp_path / "old.LUT"
    with open(old_file, "wb") as f:
        pickle.dump(old_state, f, 4)

    new_file = tmp_path / "new.LUT"
    update_lut(str(old_file), str(new_file))

    converted = read_lut(str(new_file))
    assert converted.phases == ["P", "S"]
    assert converted.fraction_tt == 0.1
    assert not hasattr(converted, "maps")
    assert (converted.node_count == lut.node_count).all()
    np.testing.assert_array_equal(converted.node_spacing, lut.node_spacing)
    for station in ("ST01", "ST02"):
        for phase in "PS":
            np.testing.assert_array_equal(
                converted[station][phase], lut[station][phase]
            )
    # And it still serves integer traveltimes
    served = converted.serve_traveltimes(100)
    assert served.dtype == np.int32
    assert served.shape[-1] == 4
