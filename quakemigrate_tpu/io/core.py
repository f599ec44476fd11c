# -*- coding: utf-8 -*-
"""
Core I/O: the Run directory/logging object and readers for the input file
types (stations, 1-D velocity models, instrument responses, pickled LUTs).

File contracts follow the reference (quakemigrate/io/core.py:24-277),
notably: station Elevations are positive-up in the file and flipped to
positive-down depths on read (ref io/core.py:95). Response reading extends
the reference with RESP and SAC_PZ support (ref declines SAC_PZ,
io/core.py:132-135).

"""

import logging
import pickle
from pathlib import Path

import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.lut import LUT


class Run:
    """
    Identifies one processing run on disk: top-level path, run name,
    optional subname, and the active stage (detect/trigger/locate). Owns
    the per-stage logging setup.

    """

    def __init__(self, path, name, subname="", stage=None, loglevel="info"):
        if "." in f"{name}{subname}":
            print(
                "Warning: The character '.' is not allowed in run names/"
                "subnames - replacing with '_'."
            )
            name, subname = (s.replace(".", "_") for s in (name, subname))

        self.path = Path(path) / name
        self._name = name
        self.stage, self.subname, self.loglevel = stage, subname, loglevel

    def __str__(self):
        banner = f"{util.log_spacer}\n{util.log_spacer}\n"
        return (
            banner
            + f"\tquakemigrate_tpu RUN - Path: {self.path} - Name: {self.name}\n"
            + banner
        )

    def logger(self, log):
        """Point the root logger at this run's stage log directory."""

        stem = self.path / self.stage / self.subname / "logs" / self.name
        util.logger(stem, log, loglevel=self.loglevel)
        logging.info(self)

    @property
    def name(self):
        return f"{self._name}_{self.subname}" if self.subname else self._name


def read_lut(lut_file):
    """Reconstruct a LUT from its pickled state."""

    with open(lut_file, "rb") as f:
        state = pickle.load(f)
    lut = LUT()
    lut.__dict__.update(state)
    return lut


def read_stations(station_file, **kwargs):
    """
    Station table from CSV. Required columns: Latitude, Longitude,
    Elevation (positive up — negated to depth on read), Name.

    """

    stations = pd.read_csv(station_file, **kwargs)

    missing = {"Latitude", "Longitude", "Elevation", "Name"} - set(stations.columns)
    if missing:
        raise util.StationFileHeaderException

    stations["Elevation"] = -stations["Elevation"]
    return stations.astype({"Name": "str"})


def stations(station_file, **kwargs):
    """Deprecated alias for :func:`read_stations` (ref io/core.py:54)."""

    print(
        "FutureWarning: function name has changed - continuing.\n"
        "To remove this message, change:\t'stations' -> 'read_stations'"
    )
    return read_stations(station_file, **kwargs)


def read_vmodel(vmodel_file, **kwargs):
    """
    1-D velocity model from CSV: a "Depth" column (positive down) plus one
    "V<phase>" column per phase (e.g. Vp, Vs).

    """

    vmodel = pd.read_csv(vmodel_file, **kwargs)
    if "Depth" not in vmodel.columns:
        raise util.InvalidVelocityModelHeader("Depth")
    return vmodel


def _looks_like_resp(path):
    """True for RESP (evalresp blockette) input: dir of RESP.* or non-XML."""

    if path.is_dir():
        return any(p.name.upper().startswith("RESP") for p in path.iterdir())
    with open(path) as f:
        for line in f:
            body = line.strip()
            if body:
                return not body.startswith("<")
    return False


def read_response_inv(response_file, sac_pz_format=False):
    """
    Build a :class:`~quakemigrate_tpu.seis.response.Inventory` from
    StationXML, RESP, or (with ``sac_pz_format``) SAC poles-and-zeros files.

    """

    if sac_pz_format:
        # Native support here; the reference declines these files
        # (reference: io/core.py:132-135).
        from quakemigrate_tpu.seis.sacpz import read_sac_pz

        return read_sac_pz(response_file)

    if _looks_like_resp(Path(response_file)):
        from quakemigrate_tpu.seis.resp import read_resp

        return read_resp(response_file)

    from quakemigrate_tpu.seis import read_inventory

    try:
        return read_inventory(response_file)
    except Exception as err:
        raise TypeError(f"Response file not readable as StationXML: {err}")
