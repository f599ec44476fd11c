# -*- coding: utf-8 -*-
"""
Download the waveform data and instrument response inventory for the
Iceland icequake example from IRIS (miniSEED + StationXML), into the
archive layout the example scripts scan. Native replacement for the
reference's ObsPy mass-downloader script (reference
examples/Icequake_Iceland/get_iceland_icequake_data.py).

Requires network access to IRIS.

"""

import pathlib

from quakemigrate_tpu.io import read_stations
from quakemigrate_tpu.io.fdsn import download_waveform_archive
from quakemigrate_tpu.seis import UTCDateTime

HERE = pathlib.Path(__file__).parent

stations = read_stations(HERE / "inputs" / "iceland_stations.txt")

written = download_waveform_archive(
    HERE / "inputs" / "mSEED",
    stations,
    network="ZK",
    starttime=UTCDateTime("2014-06-29T18:42:00.0"),
    endtime=UTCDateTime("2014-06-29T18:42:20.0"),
    channel_priorities=["CH[ZNE]", "DL[ZNE]"],
    datacentres=["IRIS"],
    stationxml_path=HERE / "inputs" / "DATALESS",
)
print(f"Downloaded {len(written)} waveform files to inputs/mSEED.")
