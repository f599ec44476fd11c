# -*- coding: utf-8 -*-
"""
Build the traveltime LUT for the Askja VT / deep-long-period example
(regional 1-D model; native 1dsweep eikonal replaces the reference's
NonLinLoc subprocess).

"""

from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import read_stations, read_vmodel
from quakemigrate_tpu.lut import compute_traveltimes
from quakemigrate_tpu.util import AttribDict

station_file = "./inputs/askja_stations.txt"
vmodel_file = "./inputs/askja_vmodel.txt"
lut_out = "./outputs/lut/askja.LUT"

stations = read_stations(station_file)
vmodel = read_vmodel(vmodel_file, comment="#")

gproj = Proj(
    proj="lcc",
    units="km",
    lon_0=-16.6,
    lat_0=65.1,
    lat_1=64.9,
    lat_2=65.3,
    datum="WGS84",
    ellps="WGS84",
    no_defs=True,
)
cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)

grid_spec = AttribDict()
grid_spec.ll_corner = [-17.3, 64.85, -3.0]
grid_spec.ur_corner = [-15.8, 65.4, 37.0]
grid_spec.node_spacing = [1.0, 1.0, 1.0]
grid_spec.grid_proj = gproj
grid_spec.coord_proj = cproj

lut = compute_traveltimes(
    grid_spec,
    stations,
    method="1dsweep",
    vmod=vmodel,
    phases=["P", "S"],
    sweep_dx=0.2,
    log=True,
    save_file=lut_out,
)
