# -*- coding: utf-8 -*-
"""
Build the traveltime LUT for the Iceland icequake example (homogeneous
velocity model, 25 m node spacing).

"""

from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import read_stations
from quakemigrate_tpu.lut import compute_traveltimes
from quakemigrate_tpu.util import AttribDict

station_file = "./inputs/iceland_stations.txt"
lut_out = "./outputs/lut/example.LUT"

stations = read_stations(station_file)

gproj = Proj(
    proj="lcc",
    units="km",
    lon_0=-17.222,
    lat_0=64.329,
    lat_1=64.323,
    lat_2=64.335,
    datum="WGS84",
    ellps="WGS84",
    no_defs=True,
)
cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)

grid_spec = AttribDict()
grid_spec.ll_corner = [-17.24, 64.322, -1.4]
grid_spec.ur_corner = [-17.204, 64.336, 0.0]
grid_spec.node_spacing = [0.025, 0.025, 0.025]
grid_spec.grid_proj = gproj
grid_spec.coord_proj = cproj

lut = compute_traveltimes(
    grid_spec,
    stations,
    method="homogeneous",
    phases=["P", "S"],
    vp=3.630,
    vs=1.833,
    log=True,
    save_file=lut_out,
)
