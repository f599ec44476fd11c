# -*- coding: utf-8 -*-
"""
Coalescence map I/O: write/read the 4-D (or marginalised 3-D) coalescence
volumes computed during locate as .npy files.

"""

import numpy as np

import quakemigrate_tpu.util as util


def read_coalescence(fname):
    """Read a coalescence map from a .npy file."""

    return np.load(fname)


@util.timeit("info")
def write_coalescence(run, coalescence_map, event, marginalised=False):
    """Write a coalescence map (3-D marginalised or 4-D) to .npy."""

    kind = "marginalised_coalescence_maps" if marginalised else "coalescence_maps"
    outdir = run.path / "locate" / run.subname / kind
    outdir.mkdir(exist_ok=True, parents=True)
    np.save(outdir / f"{event.uid}.npy", np.asarray(coalescence_map))
