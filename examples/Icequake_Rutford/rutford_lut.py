# -*- coding: utf-8 -*-
"""
Build the traveltime LUT for the Rutford Ice Stream icequake example
(high-rate cryoseismicity, Antarctica).

"""

from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import read_stations
from quakemigrate_tpu.lut import compute_traveltimes
from quakemigrate_tpu.util import AttribDict

station_file = "./inputs/rutford_stations.txt"
lut_out = "./outputs/lut/icequake.LUT"

stations = read_stations(station_file)

gproj = Proj(
    proj="lcc",
    units="km",
    lon_0=-83.925,
    lat_0=-78.145,
    lat_1=-78.16,
    lat_2=-78.13,
    datum="WGS84",
    ellps="WGS84",
    no_defs=True,
)
cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)

grid_spec = AttribDict()
grid_spec.ll_corner = [-84.1, -78.17, 1.0]
grid_spec.ur_corner = [-83.75, -78.12, 3.0]
grid_spec.node_spacing = [0.025, 0.025, 0.025]
grid_spec.grid_proj = gproj
grid_spec.coord_proj = cproj

lut = compute_traveltimes(
    grid_spec,
    stations,
    method="homogeneous",
    phases=["P", "S"],
    vp=3.841,
    vs=1.970,
    log=True,
    save_file=lut_out,
)
