# -*- coding: utf-8 -*-
"""
Download the waveform data and instrument response inventory for the
Askja VT/DLP example from IRIS (miniSEED + StationXML), into the
archive layout the example scripts scan. Native replacement for the
reference's ObsPy mass-downloader script (reference
examples/Askja_Iceland_VT-DLP/get_askja_data.py).

Requires network access to IRIS.

"""

import pathlib

from quakemigrate_tpu.io import read_stations
from quakemigrate_tpu.io.fdsn import download_waveform_archive
from quakemigrate_tpu.seis import UTCDateTime

HERE = pathlib.Path(__file__).parent

stations = read_stations(HERE / "inputs" / "askja_stations.txt")

written = download_waveform_archive(
    HERE / "inputs" / "mSEED",
    stations,
    network="Z7",
    starttime=UTCDateTime("2011-299T17:30:00"),
    endtime=UTCDateTime("2011-299T18:10:00"),
    channel_priorities=["HH[ZNE]", "BH[ZNE]"],
    datacentres=["IRIS"],
    stationxml_path=HERE / "inputs" / "DATALESS",
)
print(f"Downloaded {len(written)} waveform files to inputs/mSEED.")
