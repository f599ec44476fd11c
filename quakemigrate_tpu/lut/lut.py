# -*- coding: utf-8 -*-
"""
Traveltime lookup tables on a Cartesian grid.

Mirrors the reference's Grid3D/LUT semantics (quakemigrate/lut/lut.py:25-943)
-- projection-aware 3-D grids, per-station-per-phase traveltime tables,
integer-sample serving for the migration kernel -- built on
quakemigrate_tpu.coords instead of pyproj.

The served traveltime stack is the device-side input of the TPU migration
kernel: ``serve_traveltimes`` returns int32 sample offsets with shape
(nx, ny, nz, n_onsets) for API parity (reference: lut.py:502-538); the scan
engine flattens the node axis to the node-major [n_nodes, n_onsets] layout
the kernel wants.

"""

import copy
import pathlib
import pickle

import numpy as np
import pandas as pd
from scipy.interpolate import RegularGridInterpolator

from quakemigrate_tpu.coords import Transformer


class Grid3D:
    """
    A regular 3-D grid defined by its lower-left/upper-right corners (in the
    input coordinate projection), a node spacing, and a pair of projections
    (input coordinate space and grid space).

    """

    def __init__(self, ll_corner, ur_corner, node_spacing, grid_proj, coord_proj):
        self.grid_proj = grid_proj
        self.coord_proj = coord_proj

        self.ll_corner = self.coord2grid(ll_corner)[0]
        self.ur_corner = self.coord2grid(ur_corner)[0]

        grid_dims = self.ur_corner - self.ll_corner
        self.node_spacing = node_spacing
        self.node_count = np.ceil(grid_dims / self.node_spacing) + 1

    def decimate(self, df, inplace=False):
        """Decimate the traveltime tables by an integer factor per axis."""

        df = np.array(df, dtype=int)

        new_node_count = 1 + (self.node_count - 1) // df
        c1 = (self.node_count - df * (new_node_count - 1) - 1) // 2

        grid = self if inplace else copy.deepcopy(self)
        grid.node_count = new_node_count
        grid.node_spacing = self.node_spacing * df

        for station, phase_tables in grid.traveltimes.items():
            for phase, ttimes in phase_tables.items():
                grid[station][phase] = ttimes[
                    c1[0] :: df[0], c1[1] :: df[1], c1[2] :: df[2]
                ]

        if not inplace:
            return grid

    def index2grid(self, value, inverse=False, unravel=False):
        """Convert between grid indices and grid coordinate space."""

        if unravel:
            value = np.column_stack(np.unravel_index(value, self.node_count))
        else:
            value = np.array(value)

        if inverse:
            out = np.rint((value - self.ll_corner) / self.node_spacing)
            out = np.vstack(out.astype(int))
        else:
            out = np.vstack(self.ll_corner + (value * self.node_spacing))

        if out.shape[1] == 1:
            out = out.T

        return out

    def coord2grid(self, value, inverse=False):
        """Convert between input coordinate space and grid coordinate space."""

        v1, v2, v3 = np.array(value, dtype=float).T

        if inverse:
            transformer = Transformer.from_proj(self.grid_proj, self.coord_proj)
        else:
            transformer = Transformer.from_proj(self.coord_proj, self.grid_proj)

        return np.column_stack(transformer.transform(v1, v2, v3))

    def index2coord(self, value, inverse=False, unravel=False):
        """Convert between grid indices and input coordinate space."""

        if inverse:
            value = self.coord2grid(value)
            out = self.index2grid(value, inverse=True)
        else:
            value = self.index2grid(value, unravel=unravel)
            out = self.coord2grid(value, inverse=True)

        return out

    @property
    def node_count(self):
        """Number of nodes in each dimension of the grid."""

        return self._node_count

    @node_count.setter
    def node_count(self, value):
        value = np.array(value, dtype="int32")
        assert np.all(value > 0), "Node count must be greater than [0]"
        self._node_count = value

    @property
    def node_spacing(self):
        """Spacing of nodes in each dimension of the grid."""

        return self._node_spacing

    @node_spacing.setter
    def node_spacing(self, value):
        value = np.array(value, dtype="float64")
        if value.size == 1:
            value = np.repeat(value, 3)
        else:
            assert value.shape == (3,), "Node spacing must be an nx3 array."
        assert np.all(value > 0), "Node spacing must be greater than [0]"
        self._node_spacing = value

    @property
    def n_nodes(self):
        """Total number of nodes in the grid."""

        return int(np.prod(self.node_count))

    # --- deprecated parameter names from older reference scripts ---
    # (reference: lut/lut.py:365-396)

    @property
    def cell_count(self):
        return self.node_count

    @cell_count.setter
    def cell_count(self, value):
        if value is None:
            return
        print(
            "FutureWarning: Parameter name has changed - continuing.\n"
            "To remove this message, change:\n"
            "\t'cell_count' -> 'node_count'"
        )
        self.node_count = value

    @property
    def cell_size(self):
        return self.node_spacing

    @cell_size.setter
    def cell_size(self, value):
        if value is None:
            return
        print(
            "FutureWarning: Parameter name has changed - continuing.\n"
            "To remove this message, change:\n"
            "\t'cell_size' -> 'node_spacing'"
        )
        self.node_spacing = value

    @property
    def grid_corners(self):
        """xyz positions of the eight corners of the grid (grid space)."""

        c = self.node_count - 1
        i, j, k = np.meshgrid([0, c[0]], [0, c[1]], [0, c[2]], indexing="ij")

        return self.index2grid(np.c_[i.flatten(), j.flatten(), k.flatten()])

    def get_grid_extent(self, cells=False):
        """Geographic extent of the grid (nodes, or node-centred cells)."""

        ll, ur = self.grid_corners[0], self.grid_corners[-1]

        if cells is True:
            ll = ll - self.node_spacing / 2
            ur = ur + self.node_spacing / 2

        return self.coord2grid([ll, ur], inverse=True)

    grid_extent = property(get_grid_extent)

    @property
    def grid_xyz(self):
        """xyz positions of all grid nodes, as a list of 3 mesh arrays."""

        nc = self.node_count
        ijk = np.meshgrid(*[np.arange(n) for n in nc], indexing="ij")
        xyz = self.index2grid(np.column_stack([dim.flatten() for dim in ijk]))

        return [xyz[:, dim].reshape(nc) for dim in range(3)]

    @property
    def precision(self):
        """Appropriate number of decimal places per axis for outputs."""

        return [
            -int(np.format_float_scientific(axis).split("e")[1])
            for axis in np.subtract(*self.index2coord([[0, 0, 0], [1, 1, 1]]))
        ]

    @property
    def unit_conversion_factor(self):
        """Factor converting grid units to metres (1 for m, 1000 for km)."""

        return self.grid_proj.crs.axis_info[0].unit_conversion_factor

    @property
    def unit_name(self):
        """Shorthand unit name of the grid projection ("m" or "km")."""

        unit_name = self.grid_proj.crs.axis_info[0].unit_name

        return "km" if unit_name == "kilometre" else "m"


class LUT(Grid3D):
    """
    Traveltime lookup table: a Grid3D plus per-station-per-phase traveltime
    tables and the utilities to serve them to the scan engine.

    """

    def __init__(self, fraction_tt=0.1, lut_file=None, **grid_spec):
        self.station_data = pd.DataFrame()
        if grid_spec:
            super().__init__(**grid_spec)
            self.fraction_tt = fraction_tt
            self.traveltimes = {}
            self.phases = []
            self.velocity_model = ""
        else:
            self.fraction_tt = fraction_tt
            self.phases = ["P", "S"]
            if lut_file is not None:
                self.load(lut_file)

    def __str__(self):
        ll, *_, ur = self.coord2grid(self.grid_corners, inverse=True)

        out = (
            "quakemigrate_tpu traveltime lookup table\nGrid parameters"
            f"\n\tLower-left corner  : {ll[1]:10.5f}°N "
            f"{ll[0]:10.5f}°E {ll[2]:10.3f} {self.unit_name}"
            f"\n\tUpper-right corner : {ur[1]:10.5f}°N "
            f"{ur[0]:10.5f}°E {ur[2]:10.3f} {self.unit_name}"
            f"\n\tNumber of nodes    : {self.node_count}"
            f"\n\tNode spacing       : {self.node_spacing} {self.unit_name}"
            "\n\n"
        )
        out += "\tVelocity model:\n\t{}".format(
            str(self.velocity_model).replace("\n", "\n\t")
        )

        return out

    def serve_traveltimes(self, sampling_rate, availability=None):
        """
        Serve up the traveltime tables as integer sample offsets,
        shape (nx, ny, nz, n_onsets), optionally filtered by an availability
        dict keyed "station_phase".

        """

        if availability is None:
            traveltimes = self._serve_traveltimes(self.phases)
        else:
            traveltimes = []
            for key, available in availability.items():
                station, phase = key.split("_")
                if available == 1:
                    traveltimes.append(self[station][phase])
            traveltimes = np.stack(traveltimes, axis=-1)
        return np.rint(traveltimes * sampling_rate).astype(np.int32)

    def traveltime_to(self, phase, ijk, station=None):
        """Interpolated traveltime(s) to a (fractional) grid index position."""

        grid = tuple([np.arange(nc) for nc in self.node_count])

        if station is None:
            traveltimes = self._serve_traveltimes([phase])
        elif isinstance(station, str):
            traveltimes = self._serve_traveltimes([phase], [station])
        else:
            traveltimes = self._serve_traveltimes([phase], station)

        interpolator = RegularGridInterpolator(
            grid, traveltimes, bounds_error=False, fill_value=None
        )

        return interpolator(ijk)[0]

    def _serve_traveltimes(self, phases, stations=None):
        stations = self.station_data["Name"].values if stations is None else stations

        traveltimes = []
        for phase in phases:
            for station in stations:
                traveltimes.append(self[station][phase])
        return np.stack(traveltimes, axis=-1)

    def save(self, filename):
        """Pickle the LUT state to file."""

        pathlib.Path(filename).parent.mkdir(parents=True, exist_ok=True)

        with open(filename, "wb") as f:
            pickle.dump(self.__dict__, f, 4)

    def load(self, filename):
        """Restore LUT state from a pickle file."""

        with open(filename, "rb") as f:
            self.__dict__.update(pickle.load(f))

    @property
    def max_extent(self):
        """Geographic extent of the union of stations and grid, padded 5%."""

        stat_min, stat_max = self.station_extent
        grid_min, grid_max = self.get_grid_extent(cells=True)

        min_extent = [min(a, b) for a, b in zip(stat_min, grid_min)]
        max_extent = [max(a, b) for a, b in zip(stat_max, grid_max)]
        diff = abs(np.subtract(max_extent, min_extent))

        min_extent = np.subtract(min_extent, 0.05 * diff)
        max_extent = np.add(max_extent, 0.05 * diff)

        return np.array([min_extent, max_extent])

    @property
    def max_traveltime(self):
        """The maximum traveltime from any station across the grid."""

        return np.max(self._serve_traveltimes(self.phases))

    @property
    def station_extent(self):
        """Geographic extent of the seismic network."""

        coordinates = self.station_data[["Longitude", "Latitude", "Elevation"]]

        return [[f(dim) for dim in coordinates.values.T] for f in (min, max)]

    @property
    def stations_xyz(self):
        """Station locations in grid space [X, Y, Z]."""

        coordinates = self.station_data[["Longitude", "Latitude", "Elevation"]]

        return self.coord2grid(coordinates.values)

    def plot(self, fig, gs, slices=None, hypocentre=None, station_clr="k",
             station_list=None):
        """Plot grid cross-sections with stations (see plot.lut_plot)."""

        from quakemigrate_tpu.plot.lut import lut_plot

        lut_plot(self, fig, gs, slices, hypocentre, station_clr, station_list)

    def __add__(self, other):
        """Combine traveltime tables from a grid-compatible LUT."""

        if not isinstance(other, LUT):
            print("Addition not defined for non-LUT object.")
            return self
        if self == other:
            self.traveltimes.update(other.traveltimes)
            return self
        print("Grid definitions do not match - cannot combine.")

    def __eq__(self, other):
        """LUTs are equal if their grid definitions are identical."""

        if not isinstance(other, LUT):
            print("Equality of LUT with non-LUT object is undefined.")
            return False
        eq_corners = (self.grid_corners == other.grid_corners).all()
        eq_sizes = (self.node_spacing == other.node_spacing).all()
        eq_projections = (
            self.grid_proj == other.grid_proj and self.coord_proj == other.coord_proj
        )

        return bool(eq_corners and eq_sizes and eq_projections)

    def __getitem__(self, key):
        """Direct access to a station's traveltime tables."""

        try:
            return self.traveltimes[key]
        except KeyError:
            print(f"No traveltime lookup table available for '{key}'.")
