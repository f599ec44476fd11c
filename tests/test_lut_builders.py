# -*- coding: utf-8 -*-
"""
Native traveltime builders: the fast-marching eikonal solver against
analytic solutions, and cross-method consistency of the 1dfmm / 1dsweep /
3dfmm builders (the reference delegates these to scikit-fmm / NonLinLoc;
here they are native — lut/create.py, core/src/fmmlib.c).

"""

import numpy as np
import pandas as pd
import pytest

from quakemigrate_tpu import compute_traveltimes
from quakemigrate_tpu.coords import Proj
from quakemigrate_tpu.core import fast_marching


def test_fast_marching_uniform_velocity_matches_analytic():
    """On a uniform velocity field the eikonal solution is distance / v."""

    n, h, v = 41, 0.5, 3.2  # km, km/s
    velocity = np.full((n, n, n), v)
    src = (20, 20, 20)
    tt = fast_marching(velocity, (h, h, h), src, order=2)

    x, y, z = np.meshgrid(*[np.arange(n) * h] * 3, indexing="ij")
    dist = np.sqrt(
        (x - src[0] * h) ** 2 + (y - src[1] * h) ** 2 + (z - src[2] * h) ** 2
    )
    analytic = dist / v

    # Second-order FMM: small relative error away from the source where
    # the wavefront is locally planar; the worst error is near the source
    # singularity.
    mask = dist > 3 * h
    rel = np.abs(tt[mask] - analytic[mask]) / analytic[mask]
    assert rel.max() < 0.03, rel.max()
    assert tt[src] == 0.0


def test_fast_marching_two_layer_refraction():
    """
    A fast half-space below a slow one: first arrivals at long offsets in
    the slow layer must beat the direct wave (head-wave refraction), and
    every traveltime must respect the physical bounds
    dist/v_fast <= tt <= dist/v_slow.

    """

    nx, nz, h = 81, 41, 0.25
    v_slow, v_fast = 2.0, 6.0
    velocity = np.full((nx, 5, nz), v_slow)
    iface = 12  # layer boundary index
    velocity[:, :, iface:] = v_fast
    src = (5, 2, 2)
    tt = fast_marching(velocity, (h, h, h), src, order=2)

    x, y, z = np.meshgrid(
        np.arange(nx) * h, np.arange(5) * h, np.arange(nz) * h, indexing="ij"
    )
    dist = np.sqrt(
        (x - src[0] * h) ** 2 + (y - src[1] * h) ** 2 + (z - src[2] * h) ** 2
    )

    direct = dist / v_slow
    lower_bound = dist / v_fast
    assert (tt <= direct * 1.02 + 1e-9).all()
    assert (tt >= lower_bound * 0.98 - 1e-9).all()

    # At long offset within the slow layer the head wave must win by a
    # clear margin (it travels most of the way at v_fast).
    far = (70, 2, 2)
    assert tt[far] < direct[far] * 0.8


@pytest.fixture(scope="module")
def grid_and_stations():
    gproj = Proj(proj="tmerc", units="km", lon_0=0.0, lat_0=0.0)
    cproj = Proj(proj="longlat")
    grid_spec = dict(
        ll_corner=[-0.05, -0.05, -1.0],
        ur_corner=[0.05, 0.05, 16.0],
        node_spacing=[1.0, 1.0, 1.0],
        grid_proj=gproj,
        coord_proj=cproj,
    )
    angles = np.linspace(0, 2 * np.pi, 4, endpoint=False)
    stations = pd.DataFrame(
        {
            "Name": [f"ST{i}" for i in range(4)],
            "Longitude": 0.04 * np.cos(angles),
            "Latitude": 0.04 * np.sin(angles),
            "Elevation": np.zeros(4),
        }
    )
    vmodel = pd.DataFrame(
        {"Depth": [-2.0, 4.0, 12.0], "Vp": [3.0, 5.0, 6.5],
         "Vs": [1.8, 2.9, 3.7]}
    )
    return grid_spec, stations, vmodel


def test_1dfmm_homogeneous_limit(grid_and_stations):
    """With a constant 1-D model, 1dfmm must agree with the analytic
    homogeneous builder."""

    grid_spec, stations, _ = grid_and_stations
    flat = pd.DataFrame({"Depth": [-2.0, 20.0], "Vp": [4.0, 4.0],
                         "Vs": [2.4, 2.4]})

    hom = compute_traveltimes(
        grid_spec, stations, method="homogeneous", phases=["P"], vp=4.0
    )
    fmm = compute_traveltimes(
        grid_spec, stations, method="1dfmm", phases=["P"], vmod=flat
    )
    for stn in stations["Name"]:
        a = hom[stn]["P"]
        b = fmm[stn]["P"]
        mask = a > 0.3  # skip the near-source singularity
        rel = np.abs(a[mask] - b[mask]) / a[mask]
        assert rel.max() < 0.04, (stn, rel.max())


def test_1dfmm_matches_1dsweep(grid_and_stations):
    """The full-3-D FMM solve and the swept-2-D solve of the same layered
    model must agree (both are native; the reference uses scikit-fmm)."""

    grid_spec, stations, vmodel = grid_and_stations

    fmm = compute_traveltimes(
        grid_spec, stations, method="1dfmm", phases=["P"], vmod=vmodel
    )
    sweep = compute_traveltimes(
        grid_spec, stations, method="1dsweep", phases=["P"], vmod=vmodel
    )
    for stn in stations["Name"]:
        a = fmm[stn]["P"]
        b = sweep[stn]["P"]
        mask = a > 0.3
        rel = np.abs(a[mask] - b[mask]) / a[mask]
        # The discretisations genuinely differ (full-3-D FMM vs swept-2-D
        # with bilinear resampling): median agreement is tight, the worst
        # node (near-source / steep layer gradient) may reach ~8%.
        assert np.median(rel) < 0.02, (stn, np.median(rel))
        assert rel.max() < 0.10, (stn, rel.max())


def test_3dfmm_matches_1dfmm_on_layered_grid(grid_and_stations):
    """3dfmm fed the 1-D model expanded onto the grid must reproduce
    1dfmm (the reference raises NotImplementedError for 3-D models)."""

    grid_spec, stations, vmodel = grid_and_stations

    fmm1d = compute_traveltimes(
        grid_spec, stations, method="1dfmm", phases=["P"], vmod=vmodel
    )
    # Expand the layered model onto the LUT grid
    nx, ny, nz = fmm1d.node_count
    depths = fmm1d.grid_xyz[2][0, 0, :]
    v_of_z = np.interp(depths, vmodel["Depth"], vmodel["Vp"])
    vmod_3d = {"P": np.broadcast_to(v_of_z, (nx, ny, nz)).copy()}

    fmm3d = compute_traveltimes(
        grid_spec, stations, method="3dfmm", phases=["P"], vmod_3d=vmod_3d
    )
    for stn in stations["Name"]:
        a = fmm1d[stn]["P"]
        b = fmm3d[stn]["P"]
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-9)
