# -*- coding: utf-8 -*-
"""
quakemigrate_tpu.seis -- native seismic waveform data layer.

Provides the Stream/Trace/UTCDateTime data model, miniSEED I/O (with a C
STEIM1/2 codec), signal processing, and instrument response handling that
the scan pipeline is built on. This package replaces the reference's use of
ObsPy (which is not a dependency of quakemigrate_tpu).

"""

from .utcdatetime import UTCDateTime  # noqa: F401
from .trace import Stats, Stream, Trace  # noqa: F401
from .response import Inventory, read_inventory, simulate_seismometer  # noqa: F401


def read(path, starttime=None, endtime=None, nearest_sample=True, format=None):
    """
    Read a waveform file into a Stream. Format is sniffed (currently
    miniSEED and SAC are supported) unless given explicitly.

    """

    path = str(path)
    if format is None:
        with open(path, "rb") as f:
            head = f.read(16)
        if len(head) >= 8 and head[6:7] in b"DRQM" and head[:6].isdigit():
            format = "MSEED"
        elif head.startswith(b"WID2"):
            format = "GSE2"
        elif head.startswith(b"C 1 SEG Y"):
            format = "SEGY"
        else:
            format = "SAC"

    if format.upper() == "MSEED":
        from .mseed import read_mseed

        return read_mseed(
            path, starttime=starttime, endtime=endtime, nearest_sample=nearest_sample
        )
    if format.upper() == "SAC":
        from .sac import read_sac

        reader = read_sac
    elif format.upper() == "GSE2":
        from .gse2 import read_gse2

        reader = read_gse2
    elif format.upper() == "SEGY":
        from .segy import read_segy

        reader = read_segy
    else:
        raise TypeError(f"Unknown waveform format: {format}")

    st = reader(path)
    if starttime is not None or endtime is not None:
        st.trim(starttime=starttime, endtime=endtime,
                nearest_sample=nearest_sample)
    return st
