# -*- coding: utf-8 -*-
"""
Template: build a traveltime lookup table.

Edit the projections, grid specification, station file and method, then run:
    python make_lut.py

"""

from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import read_stations, read_vmodel
from quakemigrate_tpu.lut import compute_traveltimes
from quakemigrate_tpu.util import AttribDict

station_file = "./inputs/stations.txt"
vmodel_file = "./inputs/velocity_model.csv"
lut_out = "./outputs/lut/example.LUT"

# --- Read in the station information file ---
stations = read_stations(station_file)

# --- Define the input and grid projections ---
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

# --- Define the grid specification ---
grid_spec = AttribDict()
grid_spec.ll_corner = [-17.24, 64.322, -1.4]
grid_spec.ur_corner = [-17.204, 64.336, 0.0]
grid_spec.node_spacing = [0.025, 0.025, 0.025]
grid_spec.grid_proj = gproj
grid_spec.coord_proj = cproj

# --- Traveltime computation ---
# Methods: "homogeneous" (vp=..., vs=...), "1dfmm" (vmod=..., in-grid
# stations), "1dsweep" (vmod=..., any station geometry; native eikonal,
# no NonLinLoc needed), "3dfmm" (vmod_3d={phase: 3-D array}), "1dnlloc"
# (requires NonLinLoc binaries on PATH).
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

# For a 1-D model instead:
# vmodel = read_vmodel(vmodel_file)
# lut = compute_traveltimes(grid_spec, stations, method="1dsweep",
#                           phases=["P", "S"], vmod=vmodel, log=True,
#                           save_file=lut_out)
