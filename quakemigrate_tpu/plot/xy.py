# -*- coding: utf-8 -*-
"""
Support for user-supplied coordinate overlay files ("XY files"): a CSV
listing [File, Color, Linewidth, Linestyle] rows, where each File contains
Longitude,Latitude pairs (no headers; '#' comments allowed) -- e.g. coast
lines, volcano outlines, mapped faults (reference usage:
quakemigrate/signal/scan.py xy_files parameter).

"""

import logging
import pathlib

import numpy as np


def plot_xy_files(xy_files, ax):
    """Overlay each coordinate file on a lon/lat axis."""

    if xy_files is None:
        return

    xy_files = pathlib.Path(xy_files)
    try:
        spec = np.genfromtxt(
            xy_files, delimiter=",", dtype=str, comments="#", ndmin=2
        )
    except OSError as e:
        logging.warning(f"Could not read xy_files spec {xy_files}: {e}")
        return

    for row in spec:
        fname, color, linewidth, linestyle = [str(v).strip() for v in row[:4]]
        path = pathlib.Path(fname)
        if not path.is_absolute():
            path = xy_files.parent / path
        try:
            coords = np.genfromtxt(path, delimiter=",", comments="#",
                                   ndmin=2)
        except OSError as e:
            logging.warning(f"Could not read xy file {path}: {e}")
            continue
        ax.plot(
            coords[:, 0], coords[:, 1], c=color,
            lw=float(linewidth), ls=linestyle, zorder=5,
        )
