# -*- coding: utf-8 -*-
"""
Build the traveltime LUT for the Iceland dike intrusion (volcanotectonic)
example. The reference builds this table by shelling out to NonLinLoc
Grid2Time; here the native "1dsweep" fast-marching builder computes the
same 2-D solve + azimuthal sweep without external binaries.

"""

from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.io import read_stations, read_vmodel
from quakemigrate_tpu.lut import compute_traveltimes
from quakemigrate_tpu.util import AttribDict

station_file = "./inputs/iceland_stations.txt"
vmodel_file = "./inputs/iceland_vmodel.txt"
lut_out = "./outputs/lut/dike_intrusion.LUT"

stations = read_stations(station_file)
vmodel = read_vmodel(vmodel_file)

gproj = Proj(
    proj="lcc",
    units="km",
    lon_0=-16.9,
    lat_0=64.8,
    lat_1=64.7,
    lat_2=64.9,
    datum="WGS84",
    ellps="WGS84",
    no_defs=True,
)
cproj = Proj(proj="longlat", datum="WGS84", ellps="WGS84", no_defs=True)

grid_spec = AttribDict()
grid_spec.ll_corner = [-17.2, 64.7, -2.0]
grid_spec.ur_corner = [-16.6, 64.95, 16.0]
grid_spec.node_spacing = [0.5, 0.5, 0.5]
grid_spec.grid_proj = gproj
grid_spec.coord_proj = cproj

lut = compute_traveltimes(
    grid_spec,
    stations,
    method="1dsweep",
    vmod=vmodel,
    phases=["P", "S"],
    sweep_dx=0.1,
    log=True,
    save_file=lut_out,
)
