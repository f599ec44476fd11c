# -*- coding: utf-8 -*-
"""
Core I/O: run directory/logging management and input-file readers
(stations, velocity models, instrument responses, pickled LUTs).

Mirrors the reference's file contracts (quakemigrate/io/core.py:24-277):
station files are CSV with Latitude/Longitude/Elevation/Name and the
elevation sign is flipped to positive-down depth on read (io/core.py:95).

"""

import logging
import pathlib
import pickle

import pandas as pd

import quakemigrate_tpu.util as util
from quakemigrate_tpu.lut import LUT


def read_lut(lut_file):
    """Load a pickled LUT."""

    lut = LUT()
    with open(lut_file, "rb") as f:
        lut.__dict__.update(pickle.load(f))

    return lut


def read_stations(station_file, **kwargs):
    """
    Read a station file: CSV with header columns Latitude, Longitude,
    Elevation (positive up; flipped to positive-down on read), Name.

    """

    stn_data = pd.read_csv(station_file, **kwargs)

    for column in ("Latitude", "Longitude", "Elevation", "Name"):
        if column not in stn_data.columns:
            raise util.StationFileHeaderException

    stn_data["Elevation"] = stn_data["Elevation"] * -1

    stn_data = stn_data.astype({"Name": "str"})

    return stn_data


def read_vmodel(vmodel_file, **kwargs):
    """
    Read a 1-D velocity model file: CSV with header columns "Depth"
    (positive down) and "V<phase>" per phase (e.g. "Vp", "Vs").

    """

    vmodel_data = pd.read_csv(vmodel_file, **kwargs)

    if "Depth" not in vmodel_data.columns:
        raise util.InvalidVelocityModelHeader("Depth")

    return vmodel_data


def read_response_inv(response_file, sac_pz_format=False):
    """
    Read instrument response information from a StationXML file into an
    :class:`~quakemigrate_tpu.seis.response.Inventory`.

    """

    from pathlib import Path

    if sac_pz_format:
        # Supported natively here; the reference declines these files
        # (reference: io/core.py:132-135)
        from quakemigrate_tpu.seis.sacpz import read_sac_pz

        return read_sac_pz(response_file)

    # Sniff the format: StationXML, or RESP (evalresp blockette dumps --
    # a single concatenated file or a directory of RESP.N.S.L.C files)
    path = Path(response_file)
    is_resp = False
    if path.is_dir():
        is_resp = any(
            p.name.upper().startswith("RESP") for p in path.iterdir()
        )
    else:
        with open(path) as f:
            for line in f:
                stripped = line.strip()
                if not stripped:
                    continue
                is_resp = not stripped.startswith("<")
                break
    if is_resp:
        from quakemigrate_tpu.seis.resp import read_resp

        return read_resp(response_file)

    from quakemigrate_tpu.seis import read_inventory

    try:
        return read_inventory(response_file)
    except Exception as e:
        raise TypeError(
            f"Response file not readable as StationXML: {e}"
        )


class Run:
    """
    Encapsulates i/o path information for a run: a top-level path, a run
    name, an optional subname, and the current stage
    (detect/trigger/locate).

    """

    def __init__(self, path, name, subname="", stage=None, loglevel="info"):
        if "." in name or "." in subname:
            print(
                "Warning: The character '.' is not allowed in run names/"
                "subnames - replacing with '_'."
            )
            name = name.replace(".", "_")
            subname = subname.replace(".", "_")

        self.path = pathlib.Path(path) / name
        self._name = name
        self.stage = stage
        self.subname = subname
        self.loglevel = loglevel

    def __str__(self):
        return (
            f"{util.log_spacer}\n{util.log_spacer}\n"
            f"\tquakemigrate_tpu RUN - Path: {self.path} - Name: {self.name}\n"
            f"{util.log_spacer}\n{util.log_spacer}\n"
        )

    def logger(self, log):
        """Configure logging to stdout (and a per-stage logfile if log)."""

        logstem = self.path / self.stage / self.subname / "logs" / self.name
        util.logger(logstem, log, loglevel=self.loglevel)
        logging.info(self)

    @property
    def name(self):
        if self.subname == "":
            return self._name
        return f"{self._name}_{self.subname}"
